"""Tensor-parallel sharding: dp x tp train step matches pure DP.

The reference has no model parallelism (SURVEY §2.5: torch DDP only); the
'model' mesh axis is a wdno_tpu extension — conv/dense kernel out-channels
sharded Megatron-style via GSPMD param annotations.  These tests validate on
the 8-virtual-device CPU mesh that (a) the kernels really are sharded over
'model', and (b) one full train step (loss + grad + global-norm clip + Adam +
EMA) produces the same numbers as the replicated DP step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wdno_tpu.core.conditioning import smoke_spec
from wdno_tpu.core.diffusion import GaussianDiffusion
from wdno_tpu.core.schedules import make_schedule
from wdno_tpu.models.unet3d import UNet3D
from wdno_tpu.parallel.mesh import make_mesh, train_state_shardings
from wdno_tpu.train.state import TrainConfig, create_train_state
from wdno_tpu.train.trainer import make_train_step

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-virtual-device CPU mesh"
)]


def _tiny_problem():
    F, H, W, C = 8, 8, 8, 42
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=C, resnet_groups=2, init_kernel_size=3)
    state_shape = (F, H, W, C)
    x0 = jnp.zeros((8,) + state_shape, jnp.float32)
    t = jnp.zeros((8,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, t)
    spec = smoke_spec(state_shape, (6, 6, 6), is_condition_control=True)
    gd = GaussianDiffusion(model.apply, make_schedule("sigmoid", 16), state_shape=state_shape, spec=spec)
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="multistep", ema_update_after_step=0)
    batch = jnp.asarray(np.random.default_rng(0).standard_normal(x0.shape), jnp.float32)
    return gd, cfg, params, batch


def _run_step(gd, cfg, params, batch, mesh, fsdp=False):
    state = create_train_state(params, cfg)
    shardings = train_state_shardings(mesh, state, fsdp=fsdp)
    step = jax.jit(
        make_train_step(gd, cfg),
        in_shardings=(shardings, NamedSharding(mesh, P("data")), None),
        out_shardings=(shardings, None),
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_state)
    return new_state, float(metrics["loss"])


def test_tp_step_matches_dp():
    gd, cfg, params, batch = _tiny_problem()
    dp_state, dp_loss = _run_step(gd, cfg, params, batch, make_mesh(model=1))
    tp_state, tp_loss = _run_step(gd, cfg, params, batch, make_mesh(model=2))

    assert np.isfinite(dp_loss)
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=2e-4)
    flat_dp = jax.tree_util.tree_leaves(dp_state.params)
    flat_tp = jax.tree_util.tree_leaves(tp_state.params)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_tp_kernels_actually_sharded():
    gd, cfg, params, batch = _tiny_problem()
    mesh = make_mesh(model=2)
    tp_state, _ = _run_step(gd, cfg, params, batch, mesh)

    def is_tp(path, leaf):
        spec = leaf.sharding.spec
        return any(ax == "model" for ax in spec if ax is not None)

    flags = jax.tree_util.tree_map_with_path(is_tp, tp_state.params)
    n_tp = sum(jax.tree_util.tree_leaves(flags))
    assert n_tp > 10, f"only {n_tp} params sharded over 'model'"
    # EMA and Adam moments mirror the param shardings (memory actually split)
    ema_flags = jax.tree_util.tree_map_with_path(is_tp, tp_state.ema_params)
    assert sum(jax.tree_util.tree_leaves(ema_flags)) == n_tp


def test_fsdp_step_matches_dp():
    gd, cfg, params, batch = _tiny_problem()
    dp_state, dp_loss = _run_step(gd, cfg, params, batch, make_mesh(model=1))
    fs_state, fs_loss = _run_step(
        gd, cfg, params, batch, make_mesh(model=2), fsdp=True
    )
    np.testing.assert_allclose(fs_loss, dp_loss, rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_state.params),
        jax.tree_util.tree_leaves(fs_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)

    def on_data(path, leaf):
        return any(ax == "data" for ax in leaf.sharding.spec if ax is not None)

    flags = jax.tree_util.tree_map_with_path(on_data, fs_state.params)
    assert sum(jax.tree_util.tree_leaves(flags)) > 10


def test_context_parallel_step_matches_dp():
    # 'model' axis spent on the frame axis of the batch (sequence/context
    # parallelism): GSPMD halo-exchanges the temporal convs and gathers
    # the temporal attention; numbers must match the replicated DP step
    from wdno_tpu.train.trainer import Trainer  # noqa: F401  (API parity)

    gd, cfg, params, batch = _tiny_problem()
    dp_state, dp_loss = _run_step(gd, cfg, params, batch, make_mesh(model=1))

    mesh = make_mesh(model=2)
    state = create_train_state(params, cfg)
    shardings = train_state_shardings(mesh, state, axis="__unused__")
    step = jax.jit(
        make_train_step(gd, cfg),
        in_shardings=(shardings, NamedSharding(mesh, P("data", "model")), None),
        out_shardings=(shardings, None),
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_state)
    np.testing.assert_allclose(float(metrics["loss"]), dp_loss, rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_sharded_sampling_matches_single_device():
    # multi-chip eval: DDIM sampling with the batch sharded over 'data'
    # must produce the same samples as the unsharded path (same rng)
    gd, cfg, params, batch = _tiny_problem()
    mesh = make_mesh(model=1)
    rng = jax.random.PRNGKey(7)
    cond = jnp.zeros_like(batch)
    # Short DDIM chain: per-step SPMD reassociation noise is ~1e-5 and the
    # untrained denoiser amplifies it every step, so keep the chain short
    # and the tolerance above the two-step amplification level.
    ref = gd.ddim_sample(params, rng, 8, cond_values=cond, steps=2, eta=0.0)
    shd = gd.ddim_sample(
        params, rng, 8, cond_values=cond, steps=2, eta=0.0,
        batch_sharding=NamedSharding(mesh, P("data")),
    )
    assert np.isfinite(np.asarray(shd)).all()
    np.testing.assert_allclose(np.asarray(shd), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_guided_control_eval_sharded_executes():
    # the real multi-chip eval path: guided DDIM sampling (J-gradient
    # through the iDWT inside the scan) + solver re-simulation, with the
    # batch sharded over the mesh
    from wdno_tpu.core.conditioning import burgers_wavelet_spec
    from wdno_tpu.data.rescalers import burgers_wavelet_rescaler
    from wdno_tpu.eval.burgers_eval import BurgersEvalConfig, eval_control_batch
    from wdno_tpu.models.unet2d import UNet2D

    rescaler = burgers_wavelet_rescaler()
    cfg = BurgersEvalConfig(
        rescaler=rescaler, coef_shape=(41, 60), ori_shape=(81, 120),
        is_condition_u0=True, is_condition_uT=True,
    )
    model = UNet2D(dim=8, dim_mults=(1, 2), channels=9, resnet_block_groups=1)
    state_shape = (64, 64, 9)
    spec = burgers_wavelet_spec(
        state_shape, (41, 60), is_condition_u0=True, is_condition_uT=True
    )
    gd = GaussianDiffusion(
        model.apply, make_schedule("cosine", 10), state_shape=state_shape,
        spec=spec, sampling_timesteps=4, loss_channel_weight=rescaler,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + state_shape), jnp.zeros((1,), jnp.int32)
    )
    x = np.linspace(0, 2 * np.pi, 120, dtype=np.float32)
    t = np.linspace(0, 1, 81, dtype=np.float32)[:, None]
    u_target = jnp.asarray(
        np.stack([np.sin((k + 1) * x) * np.exp(-t) for k in range(8)])
    )
    r = eval_control_batch(
        gd, params, jax.random.PRNGKey(1), cfg, u_target=u_target,
        solver_factor=2, mesh=make_mesh(model=1),
    )
    for k in ("J_actual", "control_energy", "total_J", "J_diffused"):
        assert np.isfinite(r[k]).all(), k
    assert r["u"].shape == (8, 81, 120) and r["f"].shape == (8, 80, 120)


def test_tp4_executes():
    gd, cfg, params, batch = _tiny_problem()
    _, loss = _run_step(gd, cfg, params, batch, make_mesh(model=4))
    assert np.isfinite(loss)
