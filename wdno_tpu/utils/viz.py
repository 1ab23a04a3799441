"""Visualization helpers: trajectory heatmaps and smoke-rollout GIFs.

TPU-native replacement for the reference's matplotlib/GIF helpers
(``smoke/dataset/evaluate_solver.py:228-367`` renders density frames with
the obstacle maze overlaid; the PhiFlow Dash GUI is dead code and not
ported).  Everything here is host-side numpy -> PNG/GIF; nothing imports
jax so it can run while a training job owns the device.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _colormap(x: np.ndarray, cmap: str = "magma") -> np.ndarray:
    """[H, W] floats in [0, 1] -> [H, W, 3] uint8 via matplotlib."""
    import matplotlib

    return (matplotlib.colormaps[cmap](np.clip(x, 0.0, 1.0))[..., :3] * 255).astype(np.uint8)


def _normalize(x: np.ndarray, lo: Optional[float] = None, hi: Optional[float] = None):
    lo = float(np.min(x)) if lo is None else lo
    hi = float(np.max(x)) if hi is None else hi
    return (x - lo) / (hi - lo + 1e-12)


def render_burgers_heatmap(
    u: np.ndarray, path: str, *, f: Optional[np.ndarray] = None, title: str = ""
) -> str:
    """u [nt, nx] (and optionally f [nt-1, nx]) -> PNG heatmap(s) of the
    space-time field, x horizontal / t downward."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncols = 2 if f is not None else 1
    fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4), squeeze=False)
    im = axes[0, 0].imshow(np.asarray(u), aspect="auto", cmap="RdBu_r")
    axes[0, 0].set(title=f"u {title}", xlabel="x", ylabel="t")
    fig.colorbar(im, ax=axes[0, 0])
    if f is not None:
        im = axes[0, 1].imshow(np.asarray(f), aspect="auto", cmap="RdBu_r")
        axes[0, 1].set(title=f"f {title}", xlabel="x", ylabel="t")
        fig.colorbar(im, ax=axes[0, 1])
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def render_smoke_gif(
    density: np.ndarray,
    path: str,
    *,
    obstacles: Optional[np.ndarray] = None,
    fps: int = 12,
    upscale: int = 4,
) -> str:
    """density [T, H, W] -> animated GIF; obstacle cells ([H, W] mask of
    1=blocked) are drawn grey like the reference's maze overlay."""
    from PIL import Image

    d = _normalize(np.asarray(density, np.float32), lo=0.0)
    frames = []
    for t in range(d.shape[0]):
        rgb = _colormap(d[t])
        if obstacles is not None:
            rgb = rgb.copy()
            rgb[np.asarray(obstacles) > 0.5] = (128, 128, 128)
        img = Image.fromarray(rgb[::-1])  # y axis up, like the reference plots
        if upscale > 1:
            img = img.resize((img.width * upscale, img.height * upscale), Image.NEAREST)
        frames.append(img)
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=max(1, 1000 // fps), loop=0,
    )
    return path


def render_smoke_frames(
    density: np.ndarray,
    path: str,
    *,
    times: Sequence[int] = (),
    obstacles: Optional[np.ndarray] = None,
) -> str:
    """Strip of selected frames (default: 6 evenly spaced) as one PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = np.asarray(density)
    times = list(times) or list(np.linspace(0, d.shape[0] - 1, 6).astype(int))
    fig, axes = plt.subplots(1, len(times), figsize=(2.4 * len(times), 2.8))
    lo, hi = float(d.min()), float(d.max())
    for ax, t in zip(np.atleast_1d(axes), times):
        frame = _normalize(d[t], lo, hi)
        rgb = _colormap(frame)
        if obstacles is not None:
            rgb = rgb.copy()
            rgb[np.asarray(obstacles) > 0.5] = (128, 128, 128)
        ax.imshow(rgb[::-1])
        ax.set(title=f"t={t}")
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
