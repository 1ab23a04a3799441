"""Staggered (MAC) grid operations in JAX, batched and jittable.

TPU-native replacement of the vendored legacy PhiFlow grid math
(``smoke/phi/math/nd.py:312-629``): staggered fields are arrays
``[B, H+1, W+1, 2]`` over spatial dims ordered (y, x) with channel 0 the
x-component and channel 1 the y-component — the same memory convention as
the reference (``evaluate_solver.py:66-72``: ``velocity_array[...,0]=vx``).

The semi-Lagrangian advection replaces scipy ``interpn`` resampling
(``phi/math/scipy_backend.py:58-78``) with a vectorized gather-based
bilinear sampler, so a full 256-frame rollout compiles into one scan.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

Array = jnp.ndarray


def bilinear_resample(field: Array, coords: Array) -> Array:
    """Sample ``field [B, H, W, C]`` at ``coords [B, h, w, 2]`` ((y, x) order)
    with REPLICATE boundary handling (clamp), bilinear interpolation."""
    B, H, W, C = field.shape
    y = jnp.clip(coords[..., 0], 0.0, H - 1.0)
    x = jnp.clip(coords[..., 1], 0.0, W - 1.0)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]

    def gather(yy, xx):
        # vmap over batch: field[b] indexed at (yy[b], xx[b])
        return jax.vmap(lambda f, a, b_: f[a, b_])(field, yy, xx)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def at_centers(staggered: Array) -> Array:
    """Average face samples to cell centers: [B,H+1,W+1,2] -> [B,H,W,2]
    (reference ``nd.py:332-342``)."""
    vx = staggered[..., 0]
    vy = staggered[..., 1]
    cx = (vx[:, :-1, 1:] + vx[:, :-1, :-1]) / 2.0
    cy = (vy[:, 1:, :-1] + vy[:, :-1, :-1]) / 2.0
    return jnp.stack([cx, cy], axis=-1)


def at_faces_x(staggered: Array) -> Array:
    """Velocity vector sampled at x-face locations (reference
    ``nd.py:344-365`` with face_dimension_xyz=0): [B,H+1,W+1,2]."""
    vx = staggered[..., 0]
    vy = staggered[..., 1]
    # interpolate vy to x-faces: avg over y then over x with pad pattern
    t = vy
    # y-direction (d2 != face dim): slices1=[1:], slices2=[:-1], pad [1,0]
    t = t[:, 1:, :] + t[:, :-1, :]
    t = jnp.pad(t, ((0, 0), (1, 0), (0, 0))) / 2.0
    # x-direction (d2 == face dim... face_dimension_zyx for x in 2D is 1)
    t = t[:, :, 1:] + t[:, :, :-1]
    t = jnp.pad(t, ((0, 0), (0, 0), (0, 1))) / 2.0
    return jnp.stack([vx, t], axis=-1)


def at_faces_y(staggered: Array) -> Array:
    """Velocity vector sampled at y-face locations."""
    vx = staggered[..., 0]
    vy = staggered[..., 1]
    t = vx
    t = t[:, :, 1:] + t[:, :, :-1]
    t = jnp.pad(t, ((0, 0), (0, 0), (1, 0))) / 2.0
    t = t[:, 1:, :] + t[:, :-1, :]
    t = jnp.pad(t, ((0, 0), (0, 1), (0, 0))) / 2.0
    return jnp.stack([t, vy], axis=-1)


def divergence(staggered: Array) -> Array:
    """Face-difference divergence: [B,H+1,W+1,2] -> [B,H,W,1]
    (reference ``nd.py:367-377``)."""
    vx = staggered[..., 0]
    vy = staggered[..., 1]
    div = (vx[:, :-1, 1:] - vx[:, :-1, :-1]) + (vy[:, 1:, :-1] - vy[:, :-1, :-1])
    return div[..., None]


def pressure_gradient(pressure: Array) -> Array:
    """Staggered gradient of a scalar field with symmetric padding:
    [B,H,W,1] -> [B,H+1,W+1,2] (reference ``nd.py:602-614``)."""
    p = pressure[..., 0]
    p = jnp.pad(p, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
    gx = p[:, 1:, 1:] - p[:, 1:, :-1]
    gy = p[:, 1:, 1:] - p[:, :-1, 1:]
    return jnp.stack([gx, gy], axis=-1)


def advect_centered(staggered: Array, field: Array, dt: float = 1.0) -> Array:
    """Semi-Lagrangian advection of a centered field [B,H,W,C]
    (reference ``nd.py:422-427``)."""
    B, H, W, C = field.shape
    centered = at_centers(staggered)  # [B,H,W,2] (x,y)
    idx_y, idx_x = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    idx = jnp.stack([idx_y, idx_x], axis=-1)[None].astype(field.dtype)
    # velocity channels are (x, y); coords are (y, x)
    vel_yx = centered[..., ::-1]
    coords = idx - vel_yx * dt
    return bilinear_resample(field, coords)


def advect_mac(staggered: Array, field_mac: Array, dt: float = 1.0) -> Array:
    """Semi-Lagrangian advection of a staggered field by self-velocities
    (reference ``nd.py:429-444``)."""
    B, Hp, Wp, _ = staggered.shape
    idx_y, idx_x = jnp.meshgrid(jnp.arange(Hp), jnp.arange(Wp), indexing="ij")
    idx = jnp.stack([idx_y, idx_x], axis=-1)[None].astype(staggered.dtype)

    vx_face = at_faces_x(staggered)[..., ::-1]  # (y, x) order
    coords_x = idx - vx_face * dt
    adv_x = bilinear_resample(field_mac[..., 0:1], coords_x)

    vy_face = at_faces_y(staggered)[..., ::-1]
    coords_y = idx - vy_face * dt
    adv_y = bilinear_resample(field_mac[..., 1:2], coords_y)

    return jnp.concatenate([adv_x, adv_y], axis=-1)


def staggered_velocity_mask(fluid_mask_padded: Array) -> Array:
    """Face mask = min of adjacent padded fluid-mask cells
    (reference ``flow.py:456-473``): fluid_mask_padded [B,H+2,W+2,1] ->
    [B,H+1,W+1,2] with channels (x, y)."""
    m = fluid_mask_padded[..., 0]
    # x faces: min over (y fixed upper slice, x lower/upper)
    bc_x = jnp.minimum(m[:, 1:, 1:], m[:, 1:, :-1])
    bc_y = jnp.minimum(m[:, 1:, 1:], m[:, :-1, 1:])
    return jnp.stack([bc_x, bc_y], axis=-1)
