"""Data pipeline unit tests (no TPU required): raw-state builders, smoke
state assembly from synthetic coefficient blobs, waypoint sampling."""

import numpy as np

from wdno_tpu.data.burgers_data import build_raw_states, generate_burgers_dataset
from wdno_tpu.data.smoke_data import (
    build_smoke_coef,
    build_smoke_raw_states,
    build_smoke_states,
    sample_waypoints,
)


def _fake_fields(n=3, frames=33, nx=64):
    rng = np.random.default_rng(0)
    return {
        "Density": rng.random((n, frames, nx, nx)).astype(np.float32),
        "Velocity": rng.standard_normal((n, frames, nx, nx, 2)).astype(np.float32),
        "Control": rng.standard_normal((n, frames, nx, nx, 2)).astype(np.float32),
        "Smoke": np.abs(rng.random((n, frames, 8))).astype(np.float32) + 0.1,
    }


def test_burgers_datagen_batch_size_invariant():
    """Trajectory k must be identical however generation is batched: the
    super-res eval pairs a base test set with a separately generated
    higher-resolution test set and requires index alignment (a batch-size-
    dependent stream silently evaluates refinements against wrong GT)."""
    a = generate_burgers_dataset(7, 6, nt=20, nx=24, super_factor=1, batch_size=6)
    b = generate_burgers_dataset(7, 6, nt=20, nx=24, super_factor=1, batch_size=4)
    np.testing.assert_array_equal(a["u"], b["u"])
    np.testing.assert_array_equal(a["f"], b["f"])
    # prefix stability under a different sample count
    c = generate_burgers_dataset(7, 3, nt=20, nx=24, super_factor=1, batch_size=2)
    np.testing.assert_array_equal(a["u"][:3], c["u"])


def test_burgers_raw_states():
    rng = np.random.default_rng(1)
    u = rng.standard_normal((4, 81, 120)).astype(np.float32)
    f = rng.standard_normal((4, 80, 120)).astype(np.float32)
    st, shape, ori = build_raw_states(u, f, rescaler=10.0)
    assert st.shape == (4, 128, 128, 2)
    assert shape == [81, 120]
    np.testing.assert_allclose(st[:, :81, :120, 0] * 10.0, u, atol=1e-5)
    np.testing.assert_allclose(st[:, :80, :120, 1] * 10.0, f, atol=1e-5)
    assert (st[:, 81:, :, 0] == 0).all() and (st[:, :, 120:, :] == 0).all()

    st_s, _, _ = build_raw_states(u, f, is_super_model=True)
    assert st_s.shape[-1] == 4


def test_smoke_raw_states():
    fields = _fake_fields()
    st = build_smoke_raw_states(fields)
    assert st.shape == (3, 32, 64, 64, 6)
    # smoke-out channel is constant over space
    assert np.ptp(st[0, 5, :, :, 5]) == 0


def test_smoke_coef_and_states_time_and_space():
    fields = _fake_fields()
    for ds in ("time", "space"):
        db = build_smoke_coef(fields, n_downsample=2, downsample_type=ds)
        assert db["shape"][0] == [18, 34, 34]
        st, shape, ori = build_smoke_states(db, level=0, downsample_type=ds)
        assert st.shape == (3, 24, 40, 40, 42)
        assert np.isfinite(st).all()
        st_s, _, _ = build_smoke_states(db, level=0, is_super_model=True, downsample_type=ds)
        assert st_s.shape[-1] == 82


def test_build_smoke_coef_batch_invariant():
    """Coefficients must not depend on the streaming batch size (the prep
    was rewritten to stream into preallocated outputs after the 10k-scene
    train split OOM-killed the concatenating version)."""
    fields = _fake_fields(n=5)
    for ds in ("time", "space"):
        a = build_smoke_coef(fields, n_downsample=2, downsample_type=ds, batch=2)
        b = build_smoke_coef(fields, n_downsample=2, downsample_type=ds, batch=100)
        for k in ("coef", "init", "smokeout"):
            for x, y in zip(a[k], b[k]):
                # ULP-level tolerance only: XLA's matmul blocking (and hence
                # accumulation order) legitimately varies with batch shape.
                np.testing.assert_allclose(x, y, rtol=0, atol=1e-5)
        assert a["shape"] == b["shape"] and a["ori_shape"] == b["ori_shape"]


def test_build_smoke_states_chunk_invariant():
    """States must not depend on the memory-bounding chunk size."""
    fields = _fake_fields(n=7)
    for ds in ("time", "space"):
        db = build_smoke_coef(fields, n_downsample=2, downsample_type=ds)
        for sup in (False, True):
            a, _, _ = build_smoke_states(
                db, level=0, is_super_model=sup, downsample_type=ds, chunk=3
            )
            b, _, _ = build_smoke_states(
                db, level=0, is_super_model=sup, downsample_type=ds, chunk=100
            )
            assert np.array_equal(a, b)


def test_sample_waypoints_valid():
    rng = np.random.default_rng(2)
    xs, ys, vxs, vys, intervals = sample_waypoints(rng, 16)
    assert xs.shape == (16, 5) and vxs.shape == (16, 4)
    assert (xs[:, 0] >= 16).all() and (xs[:, 0] <= 112).all()
    assert (ys[:, -1] == 112).all()
    assert (intervals.sum(1) <= 256).all()
    assert np.isfinite(vxs).all() and np.isfinite(vys).all()


def test_smoke_datagen_batch_size_invariant(monkeypatch):
    """Scene g's random draws must be identical however generation is
    batched (same contract as the Burgers generator: scene identity =
    (seed, global index)).  Initial conditions are bitwise invariant; the
    rollout itself only matches approximately, because floating-point
    reduction order inside the batched CG solve varies with batch size and
    the advection dynamics amplify it.  Scene length is shrunk so the CPU
    rollout stays cheap."""
    import wdno_tpu.data.smoke_data as sd
    from wdno_tpu.solvers.smoke.scene import make_scene

    monkeypatch.setattr(sd, "SCENE_LEN", 8)
    scene = make_scene()
    one = sd.generate_smoke_batch(3, 4, scene, record_stride=2)
    a = sd.generate_smoke_batch(3, 2, scene, record_stride=2, start=0)
    b = sd.generate_smoke_batch(3, 2, scene, record_stride=2, start=2)
    cat = {k: np.concatenate([a[k], b[k]]) for k in one}
    # initial density is a pure function of the scene's waypoint draws
    np.testing.assert_array_equal(one["Density"][:, 0], cat["Density"][:, 0])
    for k in one:
        np.testing.assert_allclose(one[k], cat[k], atol=0.15)


def test_build_smoke_coef_levels_subset_matches_full():
    """prep-smoke --levels computes a subset of downsample exponents into a
    supplemental blob (the 33 GB level-0 member cannot be rewritten on the
    reference-budget host); subset results must be bit-identical to the
    corresponding positions of a full prep."""
    fields = _fake_fields()
    full = build_smoke_coef(fields, n_downsample=3, downsample_type="space")
    sub = build_smoke_coef(fields, downsample_type="space", levels=[1, 2])
    assert sub["levels"] == [1, 2]
    for k in ("coef", "init", "smokeout"):
        np.testing.assert_array_equal(sub[k][0], full[k][1])
        np.testing.assert_array_equal(sub[k][1], full[k][2])
    assert sub["shape"][0] == full["shape"][1]
    assert sub["ori_shape"][1] == full["ori_shape"][2]
