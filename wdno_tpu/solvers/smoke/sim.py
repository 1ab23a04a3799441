"""Batched, jitted smoke simulation rollouts.

Replaces the reference's host-side per-sample PhiFlow loops — data
generation (``a_gen_train.py:531-696``) and control re-simulation
(``evaluate_solver.py:135-196``, spawned as one OS process per sample,
``inference_2d.py:330-361``) — with a single ``lax.scan`` over 256 frames
operating on a whole batch at once on-device.  The CPU CG pressure solve
(thousands of iterations x 256 frames x N samples) was the reference's #3
hot loop (SURVEY §3); here it is the batched stencil CG of
:mod:`.pressure`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .grid import advect_centered, divergence, pressure_gradient
from .pressure import solve_pressure_cg
from .scene import SmokeScene

Array = jnp.ndarray


def with_boundary_conditions(velocity: Array, vel_mask: Array) -> Array:
    """Zero velocity into/out of obstacles (reference ``flow.py:294-298``)."""
    return velocity * vel_mask


def divergence_free(
    velocity: Array,
    scene_stencil,
    vel_mask: Array,
    accuracy: float = 1e-8,
    max_iterations: int = 500,
) -> Array:
    """Pressure projection (reference ``flow.py:318-327``)."""
    velocity = with_boundary_conditions(velocity, vel_mask)
    div = divergence(velocity)
    p = solve_pressure_cg(div, scene_stencil, accuracy, max_iterations)
    gradp = pressure_gradient(p)
    return velocity - with_boundary_conditions(gradp, vel_mask)


def compose_control_velocity(prev: Array, control: Array) -> Array:
    """Overwrite the boundary strips with the control field and keep the
    previous interior (reference ``evaluate_solver.py:89-103``): the control
    is *indirect* — it acts only outside [16:112, 16:112]."""
    interior = jnp.zeros_like(prev).at[:, 16:112, 16:112, :].set(prev[:, 16:112, 16:112, :])
    strip_mask = jnp.ones(prev.shape[1:3], prev.dtype)
    strip_mask = strip_mask.at[16:112, 16:112].set(0.0)
    return interior + control * strip_mask[None, :, :, None]


class ControlRollout(NamedTuple):
    density: Array      # [B, T_rec, 128, 128]
    velocity: Array     # [B, T_rec, 128, 128, 2]
    smoke_out: Array    # [B, T_rec] target-bucket smoke ratio


def control_rollout(
    scene: SmokeScene,
    init_velocity: Array,  # [B, 128, 128, 2] staggered
    init_density: Array,  # [B, nx, nx]
    c1: Array,  # [B, nt, nx, nx]
    c2: Array,
    num_t: int = 256,
    accuracy: float = 1e-8,
    max_iterations: int = 500,
    record_stride: int = 1,
) -> ControlRollout:
    """Re-simulate a candidate control, batched (reference ``solver()``).

    Controls/density given at any dyadic sub-resolution are nearest-tiled
    up to 256 frames / 128^2 exactly like the reference
    (``evaluate_solver.py:150-154``).
    """
    B = init_density.shape[0]
    nt, nx = c1.shape[1], c1.shape[2]
    t_rep, s_rep = num_t // nt, 128 // nx

    def tile(c):
        c = jnp.repeat(c, t_rep, axis=1)
        c = jnp.repeat(jnp.repeat(c, s_rep, axis=2), s_rep, axis=3)
        return c

    c = jnp.stack([tile(c1), tile(c2)], axis=-1)  # [B, 256, 128, 128, 2]
    dens0 = jnp.repeat(jnp.repeat(init_density, s_rep, axis=1), s_rep, axis=2)
    density = dens0[:, :-1, :-1, None]  # [B, 127, 127, 1]

    stencil = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (B,) + a.shape[1:]), scene.stencil
    )
    vel_mask = jnp.asarray(scene.velocity_mask)
    smoke_masks = jnp.asarray(scene.smoke_masks[:, :-1, :-1])  # crop to 127
    concat = jnp.asarray(scene.smoke_concat[:-1, :-1])
    set_zero = jnp.asarray(scene.set_zero[:-1, :-1])

    def step(carry, c_f):
        vel, dens, dens_zero, outs = carry
        cur = compose_control_velocity(vel, c_f)
        vel = divergence_free(cur, stencil, vel_mask, accuracy, max_iterations)
        vel = with_boundary_conditions(vel, vel_mask)
        dens = advect_centered(vel, dens)
        dens_zero = advect_centered(vel, dens_zero)

        # Deliberate bug-for-bug parity with the reference EVAL solver
        # (evaluate_solver.py:170-180): smoke_outs accumulates from the
        # never-zeroed density, so bucket-resident smoke is re-counted
        # every frame, while the denominator uses the zeroed copy.  The
        # reference's DATAGEN accounts from the zeroed density instead
        # (a_gen_train.py:502-520, mirrored by generate_smoke_batch); the
        # two smoke-out semantics genuinely differ in the reference, and
        # the control metric is defined by the eval-solver variant.
        d2 = dens[..., 0]
        in_bucket = jnp.sum(d2 * concat, axis=(1, 2)) > 0  # [B]
        add = jnp.einsum("byx,kyx->bk", d2, smoke_masks)
        outs = outs + jnp.where(in_bucket[:, None], add, 0.0)
        dens_zero = jnp.where(
            in_bucket[:, None, None, None], dens_zero * set_zero[None, :, :, None], dens_zero
        )

        ratio = outs[:, 1] / (outs.sum(-1) + dens_zero[..., 0].sum((1, 2)))
        rec = (jnp.pad(d2, ((0, 0), (0, 1), (0, 1))), vel, ratio)
        return (vel, dens, dens_zero, outs), rec

    init = (
        init_velocity,
        density,
        density,
        jnp.zeros((B, scene.smoke_masks.shape[0])),
    )
    (_, _, _, _), (dens_seq, vel_seq, ratio_seq) = jax.lax.scan(
        step, init, jnp.moveaxis(c, 0, 1)
    )
    # scan stacks along axis 0 (time) -> [T, B, ...]; move batch first
    dens_seq = jnp.moveaxis(dens_seq, 0, 1)
    vel_seq = jnp.moveaxis(vel_seq, 0, 1)
    ratio_seq = jnp.moveaxis(ratio_seq, 0, 1)
    if record_stride > 1:
        dens_seq = dens_seq[:, ::record_stride]
        vel_seq = vel_seq[:, ::record_stride]
        ratio_seq = ratio_seq[:, ::record_stride]
    return ControlRollout(dens_seq, vel_seq, ratio_seq)


def solver_out_fields(roll: ControlRollout, c1: Array, c2: Array, num_t: int = 256) -> Array:
    """Assemble the [B, T, 6, 128, 128] field stack the evaluator consumes
    (reference ``inference_2d.py:363-370``): density, vel_x, vel_y,
    control_x, control_y, smoke_portion."""
    B, T = roll.density.shape[:2]
    nt, nx = c1.shape[1], c1.shape[2]
    t_rep, s_rep = num_t // nt, 128 // nx
    c1f = jnp.repeat(jnp.repeat(jnp.repeat(c1, t_rep, 1), s_rep, 2), s_rep, 3)
    c2f = jnp.repeat(jnp.repeat(jnp.repeat(c2, t_rep, 1), s_rep, 2), s_rep, 3)
    smoke = jnp.broadcast_to(roll.smoke_out[:, :, None, None], roll.density.shape)
    return jnp.stack(
        [roll.density, roll.velocity[..., 0], roll.velocity[..., 1], c1f, c2f, smoke],
        axis=2,
    )
