"""Visualization helper tests (host-side numpy -> PNG/GIF)."""

import numpy as np
from PIL import Image

from wdno_tpu.utils.viz import (
    render_burgers_heatmap,
    render_smoke_frames,
    render_smoke_gif,
)


def test_render_burgers_heatmap(tmp_path):
    rng = np.random.default_rng(0)
    p = render_burgers_heatmap(
        rng.normal(size=(81, 120)), str(tmp_path / "b.png"),
        f=rng.normal(size=(80, 120)),
    )
    with Image.open(p) as im:
        assert im.size[0] > im.size[1]  # two panels side by side


def test_render_smoke_gif_and_frames(tmp_path):
    rng = np.random.default_rng(1)
    d = rng.uniform(size=(5, 16, 16)).astype(np.float32)
    mask = np.zeros((16, 16)); mask[4:8, 4:8] = 1
    p = render_smoke_gif(d, str(tmp_path / "s.gif"), obstacles=mask, upscale=2)
    with Image.open(p) as im:
        assert im.n_frames == 5
        assert im.size == (32, 32)
        # obstacle cells are grey in the first frame
        rgb = np.asarray(im.convert("RGB"))
        assert (rgb[2 * 9, 2 * 5] == (128, 128, 128)).all()  # y flipped: row 16-1-6=9
    p2 = render_smoke_frames(d, str(tmp_path / "s.png"), times=(0, 2, 4), obstacles=mask)
    with Image.open(p2) as im:
        assert im.size[0] > 0
