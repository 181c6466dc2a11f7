"""ctypes bindings to the native feeder (native/feeder.cpp).

The inverse of the reference's FFI direction: there, Python calls the native
compute library (dputypes.py ctypes -> emblib.so lookup/populate_mram);
here compute is JAX and the native library accelerates *data production*
(query generation, Criteo parsing).  Falls back to numpy transparently when
the .so hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_SEARCHED = (
    os.environ.get("PEL_NATIVE_LIB", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libpelfeeder.so"),
    "libpelfeeder.so",
)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _SEARCHED:
        if not p:
            continue
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.pel_gen_uniform.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int,
        ]
        lib.pel_gen_zipf.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.pel_gen_query.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_double, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.pel_parse_criteo.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pel_parse_criteo.restype = ctypes.c_int64
        lib.pel_pack_csr.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.pel_pack_csr.restype = ctypes.c_int
        # pel_pack_buckets is newer than the other symbols: a stale .so
        # (built before it existed) must degrade to the numpy packer, not
        # break every native consumer with AttributeError
        if not hasattr(lib, "pel_pack_buckets"):
            _LIB = lib
            return lib
        lib.pel_pack_buckets.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.pel_pack_buckets.restype = ctypes.c_int
        _LIB = lib
        return lib
    _LIB = False
    return False


def available() -> bool:
    return bool(_load())


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def gen_query(
    rows: np.ndarray,  # [T] int64 table cardinalities
    batch: int,
    pooling: int,
    *,
    distribution: str = "uniform",
    alpha: float = 1.05,
    seed: int = 0,
    nthreads: int = 0,
) -> np.ndarray:  # [T, B, L] int32
    """Native multi-table query generation; numpy fallback otherwise."""
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    t = len(rows)
    lib = _load()
    if lib:
        out = np.empty((t, batch, pooling), dtype=np.int32)
        lib.pel_gen_query(
            _i32p(out),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            t, batch, pooling,
            1 if distribution == "zipf" else 0, alpha,
            seed, nthreads or (os.cpu_count() or 1),
        )
        return out
    rng = np.random.default_rng(seed)
    if distribution == "zipf":
        z = rng.zipf(alpha, size=(t, batch, pooling)) - 1
        return np.minimum(z, rows[:, None, None] - 1).astype(np.int32)
    return (
        rng.random((t, batch, pooling)) * rows[:, None, None]
    ).astype(np.int32)


def parse_criteo_raw(
    path: str, max_rows: int, hash_mod: int = 1 << 20
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Native Criteo train.txt parser -> (labels [N], dense [N,13] int32,
    cat [N,26] int32) or None if the library is unavailable."""
    lib = _load()
    if not lib:
        return None
    labels = np.empty(max_rows, dtype=np.float32)
    dense = np.empty((max_rows, 13), dtype=np.int32)
    cat = np.empty((max_rows, 26), dtype=np.int32)
    n = lib.pel_parse_criteo(
        path.encode(), max_rows, hash_mod,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i32p(dense), _i32p(cat),
    )
    if n < 0:
        raise FileNotFoundError(path)
    return labels[:n], dense[:n], cat[:n]


def pack_csr(
    values: np.ndarray,  # concatenated bag values, table-major (int32)
    voff: np.ndarray,  # [T+1] int64 per-table offsets into values
    lens: np.ndarray,  # [T, B] int32 bag lengths
    *,
    num_shards: int,
    capacity_per_shard: int,
    pad_index: int = 0,
    nthreads: int = 0,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native CSR wire packer (the serving payload assembly the reference
    keeps in its C host runtime): -> (indices [T, Nd*Cd], offsets
    [T, Nd*(Bd+1)]) in the data-sharded lookup_csr contract, or None if
    the library is unavailable (use ops.ragged.shard_csr).  Raises on
    window overflow (fixed capacity is the wire contract)."""
    lib = _load()
    if not lib:
        return None
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.int32)
    voff = np.ascontiguousarray(voff, dtype=np.int64)
    t, b = lens.shape
    # pel_pack_csr also returns -1 for shard-count misuse; validate here so
    # a divisibility error is not misreported as capacity overflow (ADVICE
    # r4)
    if num_shards <= 0 or b % num_shards:
        raise ValueError(
            f"pack_csr: batch {b} must divide by num_shards {num_shards} "
            "(> 0) — the data-sharded wire contract"
        )
    idx = np.empty((t, num_shards * capacity_per_shard), np.int32)
    off = np.empty((t, num_shards * (b // num_shards + 1)), np.int32)
    rc = lib.pel_pack_csr(
        _i32p(values), voff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(lens), t, b, num_shards, capacity_per_shard, pad_index,
        _i32p(idx), _i32p(off), nthreads or (os.cpu_count() or 1),
    )
    if rc != 0:
        raise ValueError(
            f"pack_csr: a shard window exceeds capacity {capacity_per_shard}"
        )
    return idx, off


def pack_buckets(
    indices: np.ndarray,  # [T, C] int32 flat per-table ids
    offsets: np.ndarray,  # [T, B+1]
    *,
    bucket_ls: tuple[int, ...],
    capacities: tuple[int, ...],
    tail_bags: int,
    tail_entries: int,
    pad_index: int = 0,
    nthreads: int = 0,
):
    """Native length-bucket packer (same semantics as the numpy packer in
    ops/ragged.pack_length_buckets, threaded over tables — the host-side
    wire prep the reference keeps in C, emb_host.h:234-268).

    Returns ``(idx_list, mask_list, pos_list, tail_idx, tail_off,
    tail_pos)`` with per-bucket arrays shaped [T, cap_k*L_k] /
    [cap_k], or ``None`` when the library is unavailable.  Raises
    ValueError on plan overflow (same contract as the numpy packer).
    """
    lib = _load()
    if not lib or not hasattr(lib, "pel_pack_buckets"):
        return None  # stale .so without the symbol -> numpy fallback
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    t, b = offsets.shape[0], offsets.shape[1] - 1
    # sanity the C packer cannot do safely itself: malformed offsets would
    # turn a negative length into a huge size_t memcpy (the numpy packer
    # raises cleanly on the same inputs)
    lens = offsets[:, 1:] - offsets[:, :-1]
    if (
        (lens < 0).any()
        or (offsets[:, 0] < 0).any()
        or (offsets[:, -1] > indices.shape[1]).any()
    ):
        raise ValueError(
            "pack_buckets: offsets must be non-decreasing, start >= 0, and "
            "end within indices capacity"
        )
    ls = np.ascontiguousarray(bucket_ls, dtype=np.int64)
    caps = np.ascontiguousarray(capacities, dtype=np.int64)
    nk = len(ls)
    sizes = [int(caps[k] * ls[k]) for k in range(nk)]
    idx_flat = np.empty(t * sum(sizes), np.int32)
    mask_flat = np.empty(t * sum(sizes), np.uint8)
    pos_flat = np.empty(int(caps.sum()), np.int32)
    has_tail = tail_bags > 0
    tail_idx = np.empty((t, max(tail_entries, 1)), np.int32)
    tail_off = np.empty((t, tail_bags + 1), np.int32)
    tail_pos = np.empty(max(tail_bags, 1), np.int32)
    rc = lib.pel_pack_buckets(
        _i32p(indices),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t, b, indices.shape[1],
        ls.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nk,
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tail_bags, tail_entries, pad_index,
        _i32p(idx_flat),
        mask_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(pos_flat), _i32p(tail_idx), _i32p(tail_off), _i32p(tail_pos),
        nthreads or (os.cpu_count() or 1),
    )
    if rc == -3:
        raise ValueError("pack_buckets: bad plan (bucket_ls must ascend)")
    if rc != 0:
        raise ValueError(
            "bucket plan overflow (native packer) — re-plan with more "
            "slack or fall back to lookup_csr"
        )
    idx_list, mask_list, pos_list = [], [], []
    o = po = 0
    for k in range(nk):
        w = sizes[k]
        idx_list.append(idx_flat[o * t : o * t + t * w].reshape(t, w))
        mask_list.append(
            mask_flat[o * t : o * t + t * w].reshape(t, w).astype(bool))
        pos_list.append(pos_flat[po : po + int(caps[k])])
        o += w
        po += int(caps[k])
    return (
        tuple(idx_list), tuple(mask_list), tuple(pos_list),
        tail_idx if has_tail else None,
        tail_off if has_tail else None,
        tail_pos[:tail_bags] if has_tail else None,
    )
