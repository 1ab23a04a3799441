"""Shard loaders: native mmap+prefetch batch sampling over .npy shards.

Replaces the reference's host-side input pipeline — torch DataLoader worker
processes (burgers/ddpm_burgers/train_diffusion.py:100-113) and, worse, the
per-item ``torch.load`` of a pickle blob inside the smoke training hot loop
(smoke/ddpm/data_2d.py:157) — with preconverted flat ``.npy`` shards sampled
by a C++ prefetch ring (``native/shard_loader.cpp``): the shard is mmap'd
once, worker threads gather random batches ahead of the consumer, and
``next()`` hands back a contiguous host array ready for device transfer.

``MultiResolutionLoader`` reproduces the reference ``SuperDataLoader``
semantics (burgers/ddpm_burgers/data_burgers_1d.py:243-254): each step draws
the whole batch from ONE randomly chosen resolution group, so every XLA
compilation bucket sees full batches.
"""

from __future__ import annotations

import ast
import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SRC = _NATIVE_DIR / "shard_loader.cpp"
_SO = _NATIVE_DIR / "shard_loader.so"

_build_lock = threading.Lock()
_lib = None
_build_attempted = False


def _build_native():
    """Compile (once) and load the native shard loader. Returns the ctypes
    library or None if the toolchain is unavailable."""
    global _lib, _build_attempted
    with _build_lock:
        if _lib is not None:
            return _lib
        if _build_attempted and not _SO.exists():
            return None
        _build_attempted = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", str(_SRC), "-o", str(_SO)],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO))
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.wdno_shard_open.restype = ctypes.c_void_p
        lib.wdno_shard_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.wdno_shard_next.restype = ctypes.c_int
        lib.wdno_shard_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.wdno_shard_close.restype = None
        lib.wdno_shard_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_npy_header(path):
    """Return (dtype, fortran_order, shape, payload_offset) of a .npy file."""
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"{path} is not a .npy file")
        major, _minor = f.read(2)
        n = 2 if major == 1 else 4
        hlen = int.from_bytes(f.read(n), "little")
        header = f.read(hlen).decode("latin1")
        offset = f.tell()
    d = ast.literal_eval(header)
    return np.dtype(d["descr"]), bool(d["fortran_order"]), tuple(d["shape"]), offset


def npy_payload_offset(path) -> int:
    """Byte offset of the raw array payload inside a .npy file."""
    return parse_npy_header(path)[3]


def npz_member_memmap(path, member: str) -> np.ndarray:
    """Memory-map one array stored inside an UNCOMPRESSED ``.npz``.

    ``np.savez`` writes a plain ZIP with ``ZIP_STORED`` members, so every
    member is a byte-exact ``.npy`` file at a fixed offset — mappable in
    place without extracting a second multi-GB copy to disk (the reference
    pipeline re-reads its coefficient blobs wholesale,
    ``smoke/ddpm/data_2d.py:43-52``; here a 30+ GB member costs a page
    table, not RAM).  Raises ``ValueError`` for compressed members
    (``np.savez_compressed``).
    """
    import struct
    import zipfile

    name = member if member.endswith(".npy") else member + ".npy"
    with zipfile.ZipFile(path) as zf:
        zi = zf.getinfo(name)
        if zi.compress_type != zipfile.ZIP_STORED:
            raise ValueError(
                f"{path}:{name} is deflated; only np.savez (uncompressed) "
                "members can be memory-mapped"
            )
        header_offset = zi.header_offset
    with open(path, "rb") as f:
        # local file header: 30 fixed bytes, then filename + extra field
        # (whose length can differ from the central directory's copy)
        f.seek(header_offset)
        lfh = f.read(30)
        if lfh[:4] != b"PK\x03\x04":
            raise ValueError(f"{path}: bad local file header for {name}")
        n_name, n_extra = struct.unpack("<HH", lfh[26:30])
        payload = header_offset + 30 + n_name + n_extra
        f.seek(payload)
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"{path}:{name} does not contain a .npy array")
        major, _minor = f.read(2)
        n = 2 if major == 1 else 4
        hlen = int.from_bytes(f.read(n), "little")
        hdr = ast.literal_eval(f.read(hlen).decode("latin1"))
        data_offset = payload + 6 + 2 + n + hlen
    if hdr["fortran_order"]:
        raise ValueError(f"{path}:{name} is fortran-order")
    return np.memmap(path, dtype=np.dtype(hdr["descr"]), mode="r",
                     offset=data_offset, shape=tuple(hdr["shape"]))


class NativeShardLoader:
    """Random-batch sampler over one .npy shard of shape [N, ...].

    Uses the native prefetch ring when the toolchain is available, else a
    numpy-memmap fallback with identical semantics (but no lookahead).
    """

    def __init__(self, path, batch_size: int, seed: int = 0,
                 n_threads: int = 2, ring_slots: int = 4):
        self.path = str(path)
        self.batch_size = int(batch_size)
        dtype, fortran, shape, offset = parse_npy_header(self.path)
        if fortran:
            raise ValueError("fortran-order shards are not supported")
        if len(shape) < 1 or shape[0] == 0:
            raise ValueError(f"empty shard {path}")
        self.dtype = dtype
        self.n_items = int(shape[0])
        self.item_shape = tuple(shape[1:])
        self._item_bytes = int(np.prod(self.item_shape, dtype=np.int64)) * dtype.itemsize
        self._offset = offset
        self._handle = None
        self._lib = _build_native()
        if self._lib is not None:
            self._handle = self._lib.wdno_shard_open(
                self.path.encode(), offset, self.n_items, self._item_bytes,
                self.batch_size, int(seed), int(n_threads), int(ring_slots))
        if self._handle is None:
            self._mm = np.memmap(self.path, dtype=dtype, mode="r",
                                 offset=offset, shape=shape)
            self._rng = np.random.default_rng(seed)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def next(self) -> np.ndarray:
        out = np.empty((self.batch_size,) + self.item_shape, dtype=self.dtype)
        if self._handle is not None:
            rc = self._lib.wdno_shard_next(
                self._handle, out.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise RuntimeError("native shard_next failed")
        else:
            idx = self._rng.integers(0, self.n_items, self.batch_size)
            out[...] = self._mm[idx]
        return out

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if self._handle is not None:
            self._lib.wdno_shard_close(self._handle)
            self._handle = None

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass


class DeviceResidentLoader:
    """Batch sampler that keeps the WHOLE shard in device HBM.

    The shard is uploaded once; each ``next()`` is an on-device gather, so
    no bytes cross the host link in the training hot loop.  This is the
    TPU-idiomatic input path for datasets that fit in HBM (both reference
    workloads do at their published scales after wavelet packing) and
    removes the transfer bottleneck entirely on hosts with a slow link to
    the chip.  Single-device placement; the sharded-mesh path keeps the
    host-side :class:`NativeShardLoader`.
    """

    def __init__(self, path_or_array, batch_size: int, seed: int = 0, device=None):
        import jax
        import jax.numpy as jnp

        if isinstance(path_or_array, (str, os.PathLike)):
            arr = np.load(str(path_or_array), mmap_mode="r")
            self.path = str(path_or_array)
        else:
            arr = np.asarray(path_or_array)
            self.path = None
        if arr.ndim < 1 or arr.shape[0] == 0:
            raise ValueError("empty shard")
        self.batch_size = int(batch_size)
        self.n_items = int(arr.shape[0])
        self.item_shape = tuple(arr.shape[1:])
        self.dtype = arr.dtype
        # Store flattened to [N, prod(item)]: XLA's (8,128) tiled layout can
        # pad a small minor dimension (e.g. 9 channels) up to 2x the array's
        # true size in HBM, and the transposing copy it inserts doubles that
        # again transiently — a [40000,64,64,9] f32 shard OOMed a 16 GB chip
        # this way.  A 2D layout with a 128-divisible minor dim stores at
        # the unpadded size; batches are gathered then reshaped on device.
        flat = np.ascontiguousarray(arr).reshape(self.n_items, -1)
        self._data = jax.device_put(flat, device)
        self._rng = np.random.default_rng(seed)
        item_shape = self.item_shape
        self._take = jax.jit(
            lambda d, i: jnp.take(d, i, axis=0).reshape((i.shape[0],) + item_shape)
        )

    @property
    def native(self) -> bool:
        return False

    def next(self):
        idx = self._rng.integers(0, self.n_items, self.batch_size)
        return self._take(self._data, idx)

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        self._data = None


class ReservoirLoader:
    """Device-resident *reservoir* sampler for datasets larger than HBM.

    The TPU-idiomatic answer to "the training set does not fit on the chip
    and the host link both leaks and bottlenecks":

    * a ring of ``n_slabs`` device arrays holds a random subset of rows
      (the reservoir); every ``next()`` gathers a batch **on device** and
      runs a jitted ``transform`` over it, so the training hot loop moves
      zero bytes across the host link;
    * a background thread replaces one slab at a time from an
      epoch-shuffled stream over the host source (memmap-friendly), at a
      byte-budgeted rate — the tunneled TPU client leaks ~95% of every
      transferred byte into host RSS (measured; see also the 39 MB/step
      OOM note in the verify recipe), so total refresh traffic is capped
      by ``refresh_budget_bytes`` rather than by wall clock.

    Compared to the reference's per-item ``torch.load`` pipeline
    (``smoke/ddpm/data_2d.py:156-221``) this trades perfect per-step
    uniformity for bounded transfer: batches are uniform within a slab and
    slabs are uniform draws from the shuffled stream, which cycles the
    full dataset every ``N / slab_items`` refreshes.

    ``transform(rows, gids, *aux)`` runs jitted on device; ``aux`` arrays
    (small per-scene conditioning tables) are uploaded once in full and
    passed through so the transform can gather them by global id.
    """

    def __init__(self, source, batch_size: int, *, transform=None, aux=(),
                 n_slabs: int = 8, slab_items: int | None = None,
                 device_budget_bytes: float = 5e9,
                 refresh_budget_bytes: float = 40e9,
                 refresh_interval_s: float = 150.0,
                 seed: int = 0, start_refresh: bool = True):
        import jax
        import jax.numpy as jnp

        # ``source`` may be a tuple of first-dim-ALIGNED arrays (the smoke
        # super model samples coefficient level l and its level-l+1
        # condition for the SAME scene): every slab then holds the same ids
        # across all sources, refreshed together, and ``transform`` receives
        # one row-batch per source.
        self._srcs = tuple(source) if isinstance(source, (tuple, list)) else (source,)
        self._multi = isinstance(source, (tuple, list))
        for s in self._srcs:
            if s.ndim < 2 or s.shape[0] == 0:
                raise ValueError("each source must be [N, ...] with N > 0")
            if s.shape[0] != self._srcs[0].shape[0]:
                raise ValueError("sources must be first-dim aligned")
        self.n_items = int(self._srcs[0].shape[0])
        self.batch_size = int(batch_size)
        row_bytes = sum(
            int(np.prod(s.shape[1:], dtype=np.int64)) * s.dtype.itemsize
            for s in self._srcs)
        if slab_items is None:
            slab_items = max(self.batch_size,
                             int(device_budget_bytes / (n_slabs * row_bytes)))
        # dataset fits outright -> one resident slab, no refresh thread
        if slab_items * n_slabs >= self.n_items:
            n_slabs = 1
            slab_items = self.n_items
        self.n_slabs = int(n_slabs)
        self.slab_items = int(slab_items)
        self._slab_bytes = self.slab_items * row_bytes
        self.refresh_budget_bytes = float(refresh_budget_bytes)
        self.refresh_interval_s = float(refresh_interval_s)
        self.transferred_bytes = 0
        # Set when the refresh byte budget runs out: training then continues
        # on a frozen ~device-budget subset, which post-hoc analysis must be
        # able to see in the metrics (ADVICE r3) — the Trainer logs it.
        self.frozen = False
        self._rng = np.random.default_rng(seed)
        # the epoch stream runs on the refresh thread; np.random.Generator
        # is not thread-safe, so it gets its own instance
        self._stream_rng = np.random.default_rng(seed + 1)
        self._perm = self._stream_rng.permutation(self.n_items)
        self._perm_pos = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        # Everything device-resident is stored flattened to [N, prod]:
        # XLA's (8,128)-tiled layout pads a small minor dim (40-channel
        # states 3.2x, 4-channel conditioning 32x) — a 2D layout with a
        # large minor dim stores at the true size (same trick as
        # DeviceResidentLoader).  Rows are reshaped after the on-device
        # gather, where the padded footprint is only batch-sized.
        self._item_shapes = tuple(tuple(s.shape[1:]) for s in self._srcs)
        self.item_shape = self._item_shapes[0]
        self._aux_shapes = tuple(tuple(np.asarray(a).shape[1:]) for a in aux)
        self._aux = tuple(
            jax.device_put(np.ascontiguousarray(a).reshape(len(a), -1))
            for a in aux
        )

        self._slabs = []
        for _ in range(self.n_slabs):
            ids = self._next_ids(self.slab_items)
            self._slabs.append(self._upload(ids))

        if transform is None:
            # ADVICE r4: with a tuple source the default transform's
            # positional signature would silently bind source-b rows to the
            # gid argument — a multi-source loader only makes sense with an
            # explicit transform that consumes every row-batch.
            if self._multi:
                raise ValueError(
                    "multi-source reservoir requires an explicit transform "
                    "(the default would drop all sources after the first)"
                )

            def transform(rows, gids, *_aux):
                return rows
        item_shapes, aux_shapes = self._item_shapes, self._aux_shapes

        def _sample(slabs, gids, idx, *aux_arrs):
            rows = tuple(
                jnp.take(s, idx, axis=0).reshape((idx.shape[0],) + sh)
                for s, sh in zip(slabs, item_shapes)
            )
            gid = jnp.take(gids, idx, axis=0)
            aux_rows = tuple(
                jnp.take(a, gid, axis=0).reshape((idx.shape[0],) + sh)
                for a, sh in zip(aux_arrs, aux_shapes)
            )
            return transform(*rows, gid, *aux_rows)

        self._sample = jax.jit(_sample)

        self._thread = None
        if start_refresh and self.n_slabs > 1:
            self._thread = threading.Thread(
                target=self._refresh_loop, name="reservoir-refresh", daemon=True)
            self._thread.start()

    def _next_ids(self, m: int) -> np.ndarray:
        """Next ``m`` ids from the epoch-shuffled stream (host rng)."""
        out = []
        need = m
        while need:
            if self._perm_pos >= self.n_items:
                self._perm = self._stream_rng.permutation(self.n_items)
                self._perm_pos = 0
            take = min(need, self.n_items - self._perm_pos)
            out.append(self._perm[self._perm_pos:self._perm_pos + take])
            self._perm_pos += take
            need -= take
        return np.concatenate(out) if len(out) > 1 else out[0]

    def _upload(self, ids: np.ndarray):
        import jax

        order = np.sort(ids)  # sorted gather = sequential-ish memmap reads
        devs = []
        for src in self._srcs:
            rows = np.ascontiguousarray(src[order]).reshape(len(order), -1)
            dev = jax.device_put(rows)
            dev.block_until_ready()
            self.transferred_bytes += rows.nbytes
            devs.append(dev)
        gid = jax.device_put(order.astype(np.int32))
        self.transferred_bytes += gid.nbytes
        return tuple(devs), gid

    def _refresh_loop(self):
        cursor = 0
        while not self._stop.wait(self.refresh_interval_s):
            if self.transferred_bytes + self._slab_bytes > self.refresh_budget_bytes:
                self.frozen = True
                print("[reservoir] refresh byte budget exhausted "
                      f"({self.transferred_bytes / 1e9:.1f} GB); reservoir frozen")
                return
            try:
                slab = self._upload(self._next_ids(self.slab_items))
            except Exception as e:  # never kill training from the refresher
                print(f"[reservoir] refresh failed ({e!r}); retrying next tick")
                continue
            with self._lock:
                # close() may have run while _upload was reading a multi-GB
                # slab (join times out) — drop the orphan instead of
                # storing into a torn-down loader
                if self._slabs is None or self._stop.is_set():
                    return
                self._slabs[cursor] = slab
            cursor = (cursor + 1) % self.n_slabs

    @property
    def native(self) -> bool:
        return False

    def next(self):
        with self._lock:
            slab, gids = self._slabs[int(self._rng.integers(0, self.n_slabs))]
        idx = self._rng.integers(0, self.slab_items, self.batch_size)
        return self._sample(slab, gids, idx, *self._aux)

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        with self._lock:
            self._slabs = None
        self._aux = None


class MultiResolutionLoader:
    """SuperDataLoader-equivalent: each ``next()`` picks one resolution level
    uniformly at random and returns ``(level, batch)`` drawn wholly from that
    level's loader — one static XLA shape bucket per level."""

    def __init__(self, loaders, seed: int = 0):
        if not loaders:
            raise ValueError("need at least one loader")
        self.loaders = list(loaders)
        self._rng = np.random.default_rng(seed)

    def next(self):
        lvl = int(self._rng.integers(0, len(self.loaders)))
        return lvl, self.loaders[lvl].next()

    def __iter__(self):
        while True:
            yield self.next()
