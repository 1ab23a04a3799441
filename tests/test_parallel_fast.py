"""Fast-tier dp x tp train-step parity (VERDICT r4 weak #4).

``tests/test_parallel.py`` is slow-marked, so the default suite exercised
ZERO multi-device sharding and multi-chip correctness evidence rode solely
on the driver dryrun.  This single test keeps one dp2 x tp2 train step vs
the replicated single-mesh step in the fast tier on a minimal model
(dim-8, 4 frames, batch 4) so ``pytest -m "not slow"`` validates GSPMD
sharding every run.  Reference story: SURVEY §2.5 (the reference's DDP is
``smoke/diffusion_2d.py:1153-1181``; tp is a wdno_tpu extension).
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

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >=4 virtual devices (conftest mesh)"
)


def test_dp_tp_step_matches_replicated_fast():
    F, H, W, C = 4, 8, 8, 42
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=C, resnet_groups=2,
                   init_kernel_size=3)
    state_shape = (F, H, W, C)
    x0 = jnp.zeros((4,) + state_shape, jnp.float32)
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, t)
    spec = smoke_spec(state_shape, (6, 6, 6), is_condition_control=True)
    gd = GaussianDiffusion(model.apply, make_schedule("sigmoid", 8),
                           state_shape=state_shape, spec=spec)
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="multistep",
                      ema_update_after_step=0)
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal(x0.shape), jnp.float32)

    def run(mesh):
        state = create_train_state(params, cfg)
        shardings = train_state_shardings(mesh, state)
        step = jax.jit(
            make_train_step(gd, cfg),
            in_shardings=(shardings, NamedSharding(mesh, P("data")), None),
            out_shardings=(shardings, None),
        )
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(new_state)
        return new_state, float(metrics["loss"])

    ref_state, ref_loss = run(make_mesh(jax.devices()[:1], model=1))
    tp_state, tp_loss = run(make_mesh(jax.devices()[:4], model=2))

    assert np.isfinite(ref_loss)
    np.testing.assert_allclose(tp_loss, ref_loss, rtol=2e-4)
    # sharding really happened: at least one kernel lives on the model axis
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(tp_state.params)
        if hasattr(leaf, "sharding")
    ]
    assert any("model" in [ax for ax in s if ax is not None] for s in specs)
    # and the updated params agree with the replicated run
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(tp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
