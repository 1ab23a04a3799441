"""Evaluation metrics for both workloads.

Burgers (reference ``burgers/ddpm_burgers/test_util.py:23-98``): solver-in-
the-loop J_actual/energy/total plus MSE/MAE/NMSE/median variants.
Smoke (reference ``smoke/inference_2d.py:426-456``): masked MSE /
normalized-L2 / J_target / J_energy.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def mse_deviation(u1: Array, u2: Array, report_all: bool = False):
    """Per-sample MSE over the trailing two axes (reference ``:23-30``)."""
    d = u1 - u2
    mse = (d**2).mean(axis=(-1, -2))
    if not report_all:
        return mse
    mae = jnp.abs(d).mean(axis=(-1, -2))
    ep = 1e-5
    return mse, mae, mse / ((u2 + ep) ** 2).mean(), mae / jnp.abs(u2 + ep).mean()


def burgers_control_metric(
    u_target: Array,
    f: Array,
    u_controlled: Array,
    *,
    wf: float = 0.0,
    upsample_t: int = 0,
    report_all: bool = False,
) -> Dict[str, Array]:
    """J_actual = final-state MSE vs target; energy = sum f^2 / (2^up)^2;
    total = mse + wf * energy (reference ``test_util.py:79-98``)."""
    sub_n = u_controlled.shape[-1] // f.shape[-1]
    diff_final = u_controlled[:, -1, :] - u_target[:, -1, :]
    mse = (u_controlled[:, -1, ::sub_n] - u_target[:, -1, ::sub_n]) ** 2
    mse = mse.mean(-1)
    energy = (f**2).sum(axis=(-1, -2)) / (2**upsample_t) ** 2
    out = {
        "J_actual": mse,
        "control_energy": energy,
        "total_J": mse + wf * energy,
    }
    if report_all:
        ep = 1e-5
        out.update(
            mse_median=jnp.median(diff_final**2, axis=-1),
            mae=jnp.abs(diff_final).mean(-1),
            mae_median=jnp.median(jnp.abs(diff_final), axis=-1),
            nmse=jnp.sqrt((diff_final**2).mean(-1))
            / (jnp.sqrt((u_target[:, -1, :] ** 2).mean()) + ep),
            nmae=jnp.sqrt(jnp.abs(diff_final).mean(-1))
            / (jnp.sqrt(jnp.abs(u_target[:, -1, :]).mean()) + ep),
        )
    return out


def smoke_sim_metrics(pred: Array, data: Array, w_energy: float = 0.0) -> Dict[str, np.ndarray]:
    """Masked metrics over [B, T, 6, H, W] field stacks
    (reference ``inference_2d.py:426-445``): initial density frame excluded;
    mse over {d, v1, v2, smoke-out}; n_l2 over {d, v}."""
    mask = jnp.ones_like(pred)
    mask = mask.at[:, 0, 0].set(0.0)
    p = pred * mask
    d = data * mask
    diff = p - d
    mse = jnp.concatenate([diff[:, :, :3], diff[:, :, -1:]], axis=2)
    mse = (mse**2).mean(axis=(1, 2, 3, 4))
    mse_wo_smoke = (diff[:, :, :3] ** 2).mean(axis=(1, 2, 3, 4))
    n_l2 = jnp.sqrt((diff[:, :, :3] ** 2).sum(axis=(1, 2, 3, 4))) / jnp.sqrt(
        (d[:, :, :3] ** 2).sum(axis=(1, 2, 3, 4))
    )
    J_target = -d[:, -1, -1, 0, 0]
    J_energy = (d[:, :, 3:5] ** 2).mean(axis=(1, 2, 3, 4))
    return {
        "mse": np.asarray(mse),
        "mse_wo_smoke": np.asarray(mse_wo_smoke),
        "n_l2": np.asarray(n_l2),
        "J_target": np.asarray(J_target),
        "J_energy": np.asarray(J_energy),
        "J_total": np.asarray(J_target + w_energy * J_energy),
    }
