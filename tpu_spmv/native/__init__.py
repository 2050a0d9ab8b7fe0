"""ctypes bindings for the native runtime library (see ``native.cc``).

Every entry point has a NumPy fallback, selected automatically when the
shared library has not been built (``python -m tpu_spmv.native.build``) —
the Python API is identical either way, and the test suite asserts
native/NumPy equivalence when the library is present.
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_PATH = os.path.join(_HERE, "native.cc")
_LIB_PATH = os.path.join(_HERE, "libtpu_spmv_native.so")


def _ensure_built() -> None:
    """Auto-build the shared library at import time when missing/stale.

    Round-3 post-mortem (VERDICT r03 #1): the planner's C++ balancers
    silently no-oped in the recorded benchmark because ``*.so`` is
    gitignored and nothing built it.  The library is now built on first
    import (one ~5 s g++ invocation, then mtime-cached); failure is a
    LOUD stderr warning, never silent.
    """
    try:
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH))
        if not stale:
            return
        from .build import build

        build(verbose=False)
    except Exception as e:  # keep imports working; NumPy fallbacks serve
        print(
            "WARNING [tpu_spmv.native]: auto-build of libtpu_spmv_native.so "
            f"FAILED ({type(e).__name__}: {e}). The planner's balancing "
            "passes will silently degrade to unbalanced plans (~15-20% "
            "headline bandwidth). Run `python -m tpu_spmv.native.build` "
            "to see the compiler error.",
            file=sys.stderr, flush=True)


_lib = None
if not os.environ.get("TPU_SPMV_NO_NATIVE"):
    _ensure_built()
if os.path.exists(_LIB_PATH) and not os.environ.get("TPU_SPMV_NO_NATIVE"):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.cumcount_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib.cumcount_bounded_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib.plan_derive_bounded_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        _lib.unique_ic_bounded_i64.restype = ctypes.c_int64
        _lib.unique_ic_bounded_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib.plan_derive_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        _lib.unique_inverse_counts_i64.restype = ctypes.c_int64
        _lib.unique_inverse_counts_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib.plan_positions_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib.fill_slots_f32.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8)]
        _lib.spmv_cpu_csr_f32.argtypes = [
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _lib.coo_to_csr_f32.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float)]
        _lib.balance_extra_lanes_i64.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib.balance_extra_slots2_i64.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        _lib.balance_row_tiles_i64.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib.mtx_open.restype = ctypes.c_void_p
        _lib.mtx_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        _lib.mtx_fetch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        _lib.mtx_close.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        # missing library or stale .so lacking newer symbols: rebuild via
        # `python -m tpu_spmv.native.build`; NumPy fallbacks serve meanwhile
        _lib = None


def available() -> bool:
    return _lib is not None


def require() -> None:
    """Raise unless the native library is loaded (artifact paths call this
    so a missing/stale build fails LOUDLY instead of silently degrading to
    unbalanced plans — the round-3 own-goal, VERDICT r03 #1)."""
    if _lib is None:
        if os.environ.get("TPU_SPMV_NO_NATIVE"):
            raise RuntimeError(
                "tpu_spmv.native required but disabled via TPU_SPMV_NO_NATIVE")
        raise RuntimeError(
            "libtpu_spmv_native.so is not loaded and auto-build failed; "
            "run `python -m tpu_spmv.native.build` to see the error")


_warned: set = set()


def _warn_noop(name: str) -> None:
    """One-shot loud warning when a balancing pass silently degrades
    because the library is absent (intentional env disables stay quiet)."""
    if os.environ.get("TPU_SPMV_NO_BALANCE") or name in _warned:
        return
    _warned.add(name)
    print(
        f"WARNING [tpu_spmv.native]: {name} skipped — native library not "
        "loaded; plans will be UNBALANCED (~15-20% more groups). Build with "
        "`python -m tpu_spmv.native.build`.",
        file=sys.stderr, flush=True)


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# Direct-addressed counters beat the hash passes whenever the key space
# fits a cache-friendly array (the planner keys are dense products of
# superblock/window/chunk/lane counts); above this budget fall back to
# the hash versions.  Sized in BYTES of transient working set, not keys:
# the worst direct path (unique_ic_bounded) allocates i64 counts + i32
# ranks = 12 B/key, so 1<<24 keys caps the allocation at ~200 MB
# (ADVICE r02: the old 1<<27 key bound risked ~1.5 GB host OOM).
_DIRECT_KEYS_MAX = 1 << 24


def cumcount(keys: np.ndarray) -> np.ndarray:
    """Occurrence index of each element within its key group."""
    keys = np.ascontiguousarray(keys, np.int64)
    n = len(keys)
    if _lib is not None and n:
        out = np.empty(n, np.int64)
        kmax = int(keys.max())
        if 0 <= int(keys.min()) and kmax < _DIRECT_KEYS_MAX:
            _lib.cumcount_bounded_i64(_p(keys, ctypes.c_int64), n,
                                      kmax + 1, _p(out, ctypes.c_int64))
        else:
            _lib.cumcount_i64(_p(keys, ctypes.c_int64), n,
                              _p(out, ctypes.c_int64))
        return out
    # NumPy fallback: stable argsort + run decomposition
    if n == 0:
        return np.zeros(0, np.int64)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    counts = np.diff(np.r_[starts, n])
    out = np.empty(n, np.int64)
    out[order] = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    return out


def spmv_cpu_csr_native(num_rows: int, row_ptrs: np.ndarray,
                        col_indices: np.ndarray, values: np.ndarray,
                        x: np.ndarray, y: np.ndarray) -> bool:
    """Native golden oracle; returns False if the library is absent."""
    if _lib is None:
        return False
    _lib.spmv_cpu_csr_f32(
        num_rows,
        _p(np.ascontiguousarray(row_ptrs, np.int32), ctypes.c_int32),
        _p(np.ascontiguousarray(col_indices, np.int32), ctypes.c_int32),
        _p(np.ascontiguousarray(values, np.float32), ctypes.c_float),
        _p(np.ascontiguousarray(x, np.float32), ctypes.c_float),
        _p(y, ctypes.c_float))
    return True


def coo_to_csr(num_rows: int, coo_rows: np.ndarray, coo_cols: np.ndarray,
               coo_vals: np.ndarray):
    """Stable COO→CSR; returns (row_ptrs, col_indices, values)."""
    nnz = len(coo_rows)
    row_ptrs = np.zeros(num_rows + 1, np.int32)
    out_cols = np.empty(nnz, np.int32)
    out_vals = np.empty(nnz, np.float32)
    if _lib is not None:
        _lib.coo_to_csr_f32(
            num_rows, nnz,
            _p(np.ascontiguousarray(coo_rows, np.int32), ctypes.c_int32),
            _p(np.ascontiguousarray(coo_cols, np.int32), ctypes.c_int32),
            _p(np.ascontiguousarray(coo_vals, np.float32), ctypes.c_float),
            _p(row_ptrs, ctypes.c_int32), _p(out_cols, ctypes.c_int32),
            _p(out_vals, ctypes.c_float))
        return row_ptrs, out_cols, out_vals
    order = np.argsort(np.asarray(coo_rows, np.int64), kind="stable")
    rr = np.asarray(coo_rows, np.int64)[order]
    out_cols[:] = np.asarray(coo_cols, np.int32)[order]
    out_vals[:] = np.asarray(coo_vals, np.float32)[order]
    counts = np.bincount(rr, minlength=num_rows)
    row_ptrs[1:] = np.cumsum(counts)
    return row_ptrs, out_cols, out_vals


def mtx_read(path: str):
    """Matrix Market → (num_rows, num_cols, coo_rows, coo_cols, coo_vals).

    Uses the native parser when available, else a pure-Python one.
    """
    if _lib is not None:
        nr = ctypes.c_int32()
        nc = ctypes.c_int32()
        nnz = ctypes.c_int64()
        err = ctypes.c_int32()
        handle = _lib.mtx_open(path.encode(), ctypes.byref(nr),
                               ctypes.byref(nc), ctypes.byref(nnz),
                               ctypes.byref(err))
        if not handle:
            from ..errors import FileIOError, InvalidFormatError

            raise (InvalidFormatError if err.value == -5 else FileIOError)(
                f"mtx_read({path}): error {err.value}")
        rows = np.empty(nnz.value, np.int32)
        cols = np.empty(nnz.value, np.int32)
        vals = np.empty(nnz.value, np.float32)
        _lib.mtx_fetch(handle, _p(rows, ctypes.c_int32),
                       _p(cols, ctypes.c_int32), _p(vals, ctypes.c_float))
        _lib.mtx_close(handle)
        return int(nr.value), int(nc.value), rows, cols, vals
    return _mtx_read_py(path)


def _mtx_read_py(path: str):
    from ..errors import FileIOError, InvalidFormatError

    try:
        f = open(path, "r")
    except OSError as e:
        raise FileIOError(str(e)) from e
    with f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise InvalidFormatError("not a MatrixMarket file")
        if "coordinate" not in header or "complex" in header:
            raise InvalidFormatError("unsupported MatrixMarket variant")
        pattern = "pattern" in header
        symmetric = "symmetric" in header
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        nr, nc, n = (int(v) for v in line.split()[:3])
        rows, cols, vals = [], [], []
        for _ in range(n):
            parts = f.readline().split()
            r, c = int(parts[0]) - 1, int(parts[1]) - 1
            v = 1.0 if pattern else float(parts[2])
            rows.append(r)
            cols.append(c)
            vals.append(v)
            if symmetric and r != c:
                rows.append(c)
                cols.append(r)
                vals.append(v)
        return nr, nc, np.asarray(rows, np.int32), \
            np.asarray(cols, np.int32), np.asarray(vals, np.float32)


# depth-counter budget for the lane balancer: sups * windows*8 * 128
# int32 cells; 1<<25 caps the transient table at ~128 MB (matching the
# _DIRECT_KEYS_MAX host-memory posture).  Above it the pass switches to
# a fixed-size HASHED depth table (2^18 rows; collisions bias scores a
# little but the greedy still runs — wide matrices' extras are a small
# slot share anyway).
_BALANCE_MAX_CELLS = 1 << 25


def balance_extra_lanes(ext_ptr: np.ndarray, ext_wc: np.ndarray,
                        n_wc: int, sup_rows: int = 1024):
    """Exhaustive-greedy lane assignment for extras blocks (see
    native.cc); returns the per-extra lane array, or ``None`` when the
    native library is absent (or balancing is disabled via
    ``TPU_SPMV_NO_BALANCE``).  Oversized depth tables fall back to a
    fixed-size hashed table rather than skipping the pass.
    ``sup_rows`` keys the depth tables by the plan's true superblock
    height so extras in the same (superblock, window) bucket share
    counters."""
    n_extra = len(ext_ptr) - 1
    if _lib is None or n_extra <= 0 \
            or os.environ.get("TPU_SPMV_NO_BALANCE"):
        if _lib is None and n_extra > 0:
            _warn_noop("balance_extra_lanes")
        return None
    blocks_per_sup = max(sup_rows // 128, 1)
    n_sups = -(-n_extra // (blocks_per_sup * 128))
    # exact direct-addressed depth tables when they fit; a fixed-size
    # hashed table (2^18 rows = 128 MB) for wide matrices beyond it
    hash_bits = 0 if n_sups * n_wc * 128 <= _BALANCE_MAX_CELLS else 18
    out = np.empty(n_extra, np.int64)
    _lib.balance_extra_lanes_i64(
        n_extra,
        _p(np.ascontiguousarray(ext_ptr, np.int64), ctypes.c_int64),
        _p(np.ascontiguousarray(ext_wc, np.int64), ctypes.c_int64),
        n_wc, blocks_per_sup, hash_bits, _p(out, ctypes.c_int64))
    return out


def balance_extra_slots(ext_ptr: np.ndarray, ext_wc: np.ndarray,
                        n_wc: int, sup_rows: int = 1024,
                        window_sups: int = 2, ext_crow=None,
                        layer_aware: bool | None = None):
    """Sliding-window (superblock, lane) slot assignment for extras
    (see ``balance_extra_slots2_i64`` in native.cc); returns the
    per-extra NEW INDEX array (a permutation of ``arange(n_extra)``), or
    ``None`` when the native library is absent (or balancing is disabled
    via ``TPU_SPMV_NO_BALANCE``); oversized depth tables fall back to a
    fixed-size hashed table.  Generalizes
    :func:`balance_extra_lanes` — cross-superblock
    choice attacks the bucket-depth variance the within-block lane
    greedy cannot reach.  ``ext_crow`` (optional): per-extra row id for
    single-extra rows (-1 otherwise) — couples the slot choice to the
    combine-gather cell it determines (see native.cc).
    ``layer_aware`` (env ``TPU_SPMV_BALANCE_LAYER``): 0 = legacy d^2
    proxy; 1 = raise-count primary cost; 2 = atom-aware TRUE layer cost
    (same-cell multiplicities aggregated; candidate slots charged the
    actual increase in sum-of-bucket-maxes — see native.cc and
    docs/PERF.md for the measured comparison)."""
    n_extra = len(ext_ptr) - 1
    if _lib is None or n_extra <= 0 \
            or os.environ.get("TPU_SPMV_NO_BALANCE"):
        if _lib is None and n_extra > 0:
            _warn_noop("balance_extra_slots")
        return None
    if layer_aware is None:
        layer_aware = int(os.environ.get("TPU_SPMV_BALANCE_LAYER", "2"))
    n_sups = -(-n_extra // sup_rows)
    hash_bits = 0 if n_sups * n_wc * 128 <= _BALANCE_MAX_CELLS else 18
    out = np.empty(n_extra, np.int64)
    crow_arr = np.ascontiguousarray(ext_crow, np.int64) \
        if ext_crow is not None else None  # keep alive across the call
    crow_p = _p(crow_arr, ctypes.c_int64) if crow_arr is not None else None
    _lib.balance_extra_slots2_i64(
        n_extra,
        _p(np.ascontiguousarray(ext_ptr, np.int64), ctypes.c_int64),
        _p(np.ascontiguousarray(ext_wc, np.int64), ctypes.c_int64),
        n_wc, crow_p, sup_rows, window_sups, hash_bits,
        int(layer_aware), _p(out, ctypes.c_int64))
    return out


def balance_row_tiles(row_ptrs: np.ndarray, wc: np.ndarray, n_wc: int,
                      sup_rows: int, parts: np.ndarray | None = None):
    """Within-superblock row→lane leveling for
    ``WindowEllPlan.build(permute_rows=True)`` (see
    ``balance_row_tiles_i64`` in native.cc): assigns each 128-row tile's
    rows to distinct lanes so per-(window, chunk, lane) cell depths
    level within the superblock.  Returns the per-row LANE array (rows
    of a partial final tile confined to lanes ``[0, tile_len)``), or
    ``None`` when the native library is absent or balancing is disabled
    via ``TPU_SPMV_NO_BALANCE`` (callers keep the natural order —
    correct, just unleveled).  ``parts`` (optional) is the per-row
    stride-split count; content is divided by it so rows the builder
    will split are not over-weighted."""
    n_rows = len(row_ptrs) - 1
    if _lib is None or n_rows <= 0 \
            or os.environ.get("TPU_SPMV_NO_BALANCE"):
        if _lib is None and n_rows > 0:
            _warn_noop("balance_row_tiles")
        return None
    out = np.empty(n_rows, np.int64)
    parts_arr = np.ascontiguousarray(parts, np.int64) \
        if parts is not None else None  # keep alive across the call
    parts_p = _p(parts_arr, ctypes.c_int64) if parts_arr is not None \
        else None
    _lib.balance_row_tiles_i64(
        n_rows,
        _p(np.ascontiguousarray(row_ptrs, np.int64), ctypes.c_int64),
        _p(np.ascontiguousarray(wc, np.int64), ctypes.c_int64),
        parts_p, n_wc, sup_rows, _p(out, ctypes.c_int64))
    return out


def plan_positions(row_ptrs: np.ndarray, parts: np.ndarray,
                   extra_base_of_row: np.ndarray, extras_base: int):
    """Per-nnz (pos, row_of) for the strided row-split assignment
    (one native walk; NumPy repeat/arange/where fallback)."""
    rows = len(parts)
    row_ptrs = np.ascontiguousarray(row_ptrs, np.int32)
    nnz = int(row_ptrs[-1]) if rows else 0
    if _lib is not None and nnz:
        pos = np.empty(nnz, np.int64)
        row_of = np.empty(nnz, np.int64)
        _lib.plan_positions_i64(
            _p(row_ptrs, ctypes.c_int32), rows,
            _p(np.ascontiguousarray(parts, np.int64), ctypes.c_int64),
            _p(np.ascontiguousarray(extra_base_of_row, np.int64),
               ctypes.c_int64),
            extras_base, _p(pos, ctypes.c_int64),
            _p(row_of, ctypes.c_int64))
        return pos, row_of
    row_len = np.diff(row_ptrs).astype(np.int64)
    row_of = np.repeat(np.arange(rows, dtype=np.int64), row_len)
    in_row = np.arange(nnz, dtype=np.int64) - \
        np.repeat(row_ptrs[:-1].astype(np.int64), row_len)
    part = in_row % np.repeat(np.maximum(parts, 1), row_len)
    pos = np.where(part == 0, row_of,
                   extras_base + np.repeat(extra_base_of_row, row_len)
                   + part - 1)
    return pos, row_of


def plan_derive(pos: np.ndarray, w: np.ndarray, c: np.ndarray,
                n_windows: int, sup_rows: int):
    """Fused lane/superblock decode + per-cell layer cumcount.

    Returns (lane, sup, layer) int64 arrays; NumPy fallback when the
    native library is absent.
    """
    pos = np.ascontiguousarray(pos, np.int64)
    w = np.ascontiguousarray(w, np.int64)
    c = np.ascontiguousarray(c, np.int64)
    n = len(pos)
    if _lib is not None and n:
        lane = np.empty(n, np.int64)
        sup = np.empty(n, np.int64)
        layer = np.empty(n, np.int64)
        key_space = ((int(pos.max()) // sup_rows + 1) * n_windows) * 1024
        if key_space < _DIRECT_KEYS_MAX and int(pos.min()) >= 0:
            _lib.plan_derive_bounded_i64(
                _p(pos, ctypes.c_int64), _p(w, ctypes.c_int64),
                _p(c, ctypes.c_int64), n, n_windows, sup_rows, key_space,
                _p(lane, ctypes.c_int64), _p(sup, ctypes.c_int64),
                _p(layer, ctypes.c_int64))
        else:
            _lib.plan_derive_i64(
                _p(pos, ctypes.c_int64), _p(w, ctypes.c_int64),
                _p(c, ctypes.c_int64), n, n_windows, sup_rows,
                _p(lane, ctypes.c_int64), _p(sup, ctypes.c_int64),
                _p(layer, ctypes.c_int64))
        return lane, sup, layer
    lane = pos % 128
    sup = pos // sup_rows
    cell = ((sup * n_windows + w) * 8 + c) * 128 + lane
    return lane, sup, cumcount(cell)


def unique_inverse_counts(keys: np.ndarray):
    """np.unique(keys, return_inverse=True, return_counts=True) via one
    hash pass (native) or NumPy."""
    keys = np.ascontiguousarray(keys, np.int64)
    n = len(keys)
    if _lib is not None and n:
        uniq = np.empty(n, np.int64)
        inv = np.empty(n, np.int64)
        counts = np.empty(n, np.int64)
        kmax = int(keys.max())
        if 0 <= int(keys.min()) and kmax < _DIRECT_KEYS_MAX:
            m = _lib.unique_ic_bounded_i64(
                _p(keys, ctypes.c_int64), n, kmax + 1,
                _p(uniq, ctypes.c_int64), _p(inv, ctypes.c_int64),
                _p(counts, ctypes.c_int64))
        else:
            m = _lib.unique_inverse_counts_i64(
                _p(keys, ctypes.c_int64), n, _p(uniq, ctypes.c_int64),
                _p(inv, ctypes.c_int64), _p(counts, ctypes.c_int64))
        return uniq[:m].copy(), inv, counts[:m].copy()
    return np.unique(keys, return_inverse=True, return_counts=True)


def fill_slots(flat: np.ndarray, values: np.ndarray, cols_mod: np.ndarray,
               sbv: np.ndarray, vals_out: np.ndarray, lo_out: np.ndarray,
               sb_out: np.ndarray) -> None:
    """Scatter per-nnz (value, lane-index, sub-block) into the packed slot
    arrays in one pass."""
    n = len(flat)
    if _lib is not None and n:
        _lib.fill_slots_f32(
            n, _p(np.ascontiguousarray(flat, np.int64), ctypes.c_int64),
            _p(np.ascontiguousarray(values, np.float32), ctypes.c_float),
            _p(np.ascontiguousarray(cols_mod, np.int64), ctypes.c_int64),
            _p(np.ascontiguousarray(sbv, np.int64), ctypes.c_int64),
            _p(vals_out.reshape(-1), ctypes.c_float),
            _p(lo_out.reshape(-1), ctypes.c_int8),
            _p(sb_out.reshape(-1), ctypes.c_int8))
        return
    vals_out.reshape(-1)[flat] = values
    lo_out.reshape(-1)[flat] = cols_mod.astype(np.int8)
    sb_out.reshape(-1)[flat] = sbv.astype(np.int8)
