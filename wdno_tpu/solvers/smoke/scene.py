"""Smoke scene setup: obstacle maze, masks, buckets.

Mirrors the reference's simulation environment exactly — the 127x127 closed
domain with the fixed obstacle maze (``smoke/dataset/evaluate_solver.py:
32-63`` / ``a_gen_train.py:202-233``), PhiFlow mask semantics
(``phi/flow.py:159-199,415-473``) and the 7 bucket accounting masks
(``evaluate_solver.py:111-132``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from .grid import staggered_velocity_mask
from .pressure import LaplaceStencil, build_stencil

__all__ = ["SmokeScene", "make_scene", "OBSTACLES_128", "bucket_masks"]

# (size_y, size_x), (origin_y, origin_x) rectangles zeroed in the masks
# (reference build_obstacles_pi_128).
OBSTACLES_128: List[Tuple[Tuple[int, int], Tuple[int, int]]] = [
    ((1, 96), (16, 16)),    # bottom
    ((8, 1), (16, 16)),     # left down
    ((16, 1), (40, 16)),    # left medium
    ((40, 1), (72, 16)),    # left up
    ((8, 1), (16, 112)),    # right down
    ((16, 1), (40, 112)),   # right medium
    ((40, 1), (72, 112)),   # right up
    ((1, 8), (112, 16)),    # buckets
    ((1, 16), (112, 40)),
    ((1, 16), (112, 72)),
    ((1, 8), (112, 104)),
    ((16, 1), (64, 48)),    # y-axis obstacles
    ((16, 1), (96, 48)),
    ((16, 1), (64, 80)),
    ((16, 1), (96, 80)),
    ((1, 128 - 40 - 40), (40, 40)),  # x-axis
]


@dataclasses.dataclass(frozen=True)
class SmokeScene:
    """Static masks for the fixed smoke environment (all numpy, [1,...])."""

    fluid_mask: np.ndarray  # [1, 127, 127, 1]
    active_mask: np.ndarray  # [1, 127, 127, 1]
    velocity_mask: np.ndarray  # [1, 128, 128, 2]
    stencil: LaplaceStencil  # over [1, 127, 127]
    # bucket accounting (reference get_bucket_mask)
    smoke_masks: np.ndarray  # [7, 128, 128]
    smoke_concat: np.ndarray  # [128, 128]
    set_zero: np.ndarray  # [128, 128]

    @property
    def dims(self) -> Tuple[int, int]:
        return self.fluid_mask.shape[1:3]


def bucket_masks() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    bucket_pos = [(112, 22, 15, 20), (112, 54, 15, 20), (112, 86, 15, 20)]
    bucket_pos_y = [(22, 0, 20, 16), (54, 0, 20, 16), (22, 112, 20, 15), (54, 112, 20, 15)]
    masks = []
    set_zero = np.ones((128, 128), np.float32)
    concat = np.zeros((128, 128), np.float32)
    for (y, x, ly, lx) in bucket_pos + bucket_pos_y:
        m = np.zeros((128, 128), np.float32)
        m[y : y + ly, x : x + lx] = 1
        concat[y : y + ly, x : x + lx] = 1
        set_zero[y : y + ly, x : x + lx] = 0
        masks.append(m)
    return np.stack(masks), concat, set_zero


def make_scene(n: int = 127) -> SmokeScene:
    """Build the closed-boundary obstacle scene.

    Closed boundaries pad both the fluid and active masks with zeros
    (reference ``DomainBoundary.pad_fluid``/``pad_active`` with
    ``open=False``, ``flow.py:415-423``).
    """
    fluid = np.ones((1, n, n, 1), np.float32)
    for (sy, sx), (oy, ox) in OBSTACLES_128:
        fluid[0, oy : oy + sy, ox : ox + sx, 0] = 0
    active = fluid.copy()

    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    fluid_ext = np.pad(fluid, pad)
    active_ext = np.pad(active, pad)

    vel_mask = np.asarray(staggered_velocity_mask(jnp.asarray(fluid_ext)))
    stencil = build_stencil(jnp.asarray(active_ext), jnp.asarray(fluid_ext))
    stencil = LaplaceStencil(*(np.asarray(c) for c in stencil))

    smoke_masks, concat, set_zero = bucket_masks()
    return SmokeScene(
        fluid_mask=fluid,
        active_mask=active,
        velocity_mask=vel_mask,
        stencil=stencil,
        smoke_masks=smoke_masks,
        smoke_concat=concat,
        set_zero=set_zero,
    )
