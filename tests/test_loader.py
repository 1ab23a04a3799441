"""Native shard loader tests: build, correctness of sampled rows, throughput
sanity, fallback behavior."""

import numpy as np
import pytest

from wdno_tpu.data.loader import (
    MultiResolutionLoader,
    NativeShardLoader,
    npy_payload_offset,
    _build_native,
)


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    p = tmp_path_factory.mktemp("shard") / "states.npy"
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((257, 8, 8, 3)).astype(np.float32)
    # give every item a recognizable signature value
    arr[:, 0, 0, 0] = np.arange(257, dtype=np.float32)
    np.save(p, arr)
    return str(p), arr


def test_npy_payload_offset(shard):
    path, arr = shard
    off = npy_payload_offset(path)
    raw = np.fromfile(path, np.float32, offset=off).reshape(arr.shape)
    np.testing.assert_array_equal(raw, arr)


def test_native_builds():
    assert _build_native() is not None, "g++ build of shard_loader failed"


def test_loader_samples_valid_rows(shard):
    path, arr = shard
    ld = NativeShardLoader(path, batch_size=16, seed=1)
    assert ld.native
    seen = set()
    for _ in range(50):
        b = ld.next()
        assert b.shape == (16, 8, 8, 3)
        sig = b[:, 0, 0, 0]
        # every sampled row must be a genuine row of the source array
        assert ((sig >= 0) & (sig < 257)).all()
        for s, row in zip(sig, b):
            np.testing.assert_array_equal(row, arr[int(s)])
        seen.update(int(s) for s in sig)
    # random sampling should cover a large fraction of items
    assert len(seen) > 200
    ld.close()


def test_device_resident_loader(shard):
    from wdno_tpu.data.loader import DeviceResidentLoader

    path, arr = shard
    ld = DeviceResidentLoader(path, batch_size=16, seed=1)
    seen = set()
    for _ in range(30):
        b = np.asarray(ld.next())
        assert b.shape == (16, 8, 8, 3)
        sig = b[:, 0, 0, 0]
        for s, row in zip(sig, b):
            np.testing.assert_array_equal(row, arr[int(s)])
        seen.update(int(s) for s in sig)
    assert len(seen) > 150
    ld.close()


def test_multi_resolution_loader(shard):
    path, _ = shard
    l0 = NativeShardLoader(path, batch_size=4, seed=2)
    l1 = NativeShardLoader(path, batch_size=4, seed=3)
    ml = MultiResolutionLoader([l0, l1], seed=0)
    lvls = {ml.next()[0] for _ in range(20)}
    assert lvls == {0, 1}
    l0.close(); l1.close()
