"""Plan serialization — save/load built kernel plans (round-3 addition).

The packed plan IS the product of the host-side planner (5-20 s at the
10M-nnz capacity target on one core), while the kernel runs in ~200 µs;
without persistence every process pays the build again.  The reference
serializes its *matrices* (``csr_matrix.cpp:202-279``); the TPU analog of
that interchange surface is the built plan, because on TPU the expensive
artifact is the packed layout, not the raw arrays.

Format: a single uncompressed ``.npz`` holding the plan's array leaves
plus a JSON metadata entry (kind, format version, static aux fields).
Loading `device_put`s the leaves and reconstructs the frozen dataclasses;
a round-trip therefore skips the whole planner.
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from .errors import FileIOError, InvalidFormatError

_VERSION = 1
_WINDOW_LEAVES = ("vals", "lo", "sb", "wg", "base", "blk_step", "fin_step",
                  "extra_to_row")
_WINDOW_AUX = ("num_rows", "num_cols", "extras_base", "n_extra", "e8",
               "out8", "cols_pad", "step_groups", "split_rows", "sup",
               "sbn", "pat", "tb")
_CSR_LEAVES = ("values", "col_indices", "row_ptrs", "row_ids")


def _window_entry(plan, prefix: str, arrays: dict, meta: dict) -> None:
    for name in _WINDOW_LEAVES:
        a = getattr(plan, name)
        if a is None:       # vals is absent on pattern plans
            continue
        a = np.asarray(a)
        if a.dtype == jnp.bfloat16:
            # npz cannot store ml_dtypes — persist the raw bits with a
            # dtype tag (bf16 value streams, round 4)
            meta[prefix + name + "_dtype"] = "bfloat16"
            a = a.view(np.uint16)
        arrays[prefix + name] = a
    if plan.lam is not None:  # optional leaf: permute_rows plans only
        arrays[prefix + "lam"] = np.asarray(plan.lam)
    # "tb" was added in round 4; files saved before it load through the
    # dataclass default (aux keys are merged as keyword arguments)
    meta[prefix + "aux"] = {k: getattr(plan, k) for k in _WINDOW_AUX}
    meta[prefix + "occupancy"] = float(plan.occupancy)


def _window_from(prefix: str, z, meta: dict, put):
    from .kernels.window_ell import WindowEllPlan

    aux = meta[prefix + "aux"]
    names = getattr(z, "files", z)

    def _leaf(n):
        if prefix + n not in names:
            return None
        a = z[prefix + n]
        if meta.get(prefix + n + "_dtype") == "bfloat16":
            a = np.asarray(a).view(jnp.bfloat16)
        return put(jnp.asarray(a))

    leaves = {n: _leaf(n) for n in _WINDOW_LEAVES}
    if leaves["vals"] is None and not aux.get("pat"):
        raise InvalidFormatError(
            "plan file lacks the vals stream but is not a pattern plan")
    lam = put(jnp.asarray(z[prefix + "lam"])) \
        if prefix + "lam" in names else None
    return WindowEllPlan(**leaves, **aux, lam=lam,
                         occupancy=float(meta.get(prefix + "occupancy", 0.0)))


def save_plan(plan, path: str) -> None:
    """Serialize a built :class:`~tpu_spmv.kernels.window_ell.WindowEllPlan`
    or :class:`~tpu_spmv.kernels.window_ell.CompositePlan` to ``path``."""
    from .kernels.strips import StripPlan
    from .kernels.window_ell import BandedPlan, CompositePlan, WindowEllPlan

    arrays: dict = {}
    meta: dict = {"version": _VERSION}
    if isinstance(plan, StripPlan):
        meta["kind"] = "strips"
        meta["n_strips"] = len(plan.plans)
        meta["num_rows"] = plan.num_rows
        meta["num_cols"] = plan.num_cols
        meta["bounds"] = [list(b) for b in plan.bounds]
        kinds = []
        for i, p in enumerate(plan.plans):
            if isinstance(p, BandedPlan):
                kinds.append("banded")
                meta[f"s{i}_n_bands"] = len(p.plans)
                meta[f"s{i}_band_rows"] = list(p.band_rows)
                meta[f"s{i}_shape"] = [p.num_rows, p.num_cols]
                for j, q in enumerate(p.plans):
                    _window_entry(q, f"s{i}b{j}_", arrays, meta)
            else:
                kinds.append("window_ell")
                _window_entry(p, f"s{i}_", arrays, meta)
        meta["strip_kinds"] = kinds
    elif isinstance(plan, WindowEllPlan):
        meta["kind"] = "window_ell"
        _window_entry(plan, "p_", arrays, meta)
    elif isinstance(plan, BandedPlan):
        meta["kind"] = "banded"
        meta["n_bands"] = len(plan.plans)
        meta["num_rows"] = plan.num_rows
        meta["num_cols"] = plan.num_cols
        meta["band_rows"] = list(plan.band_rows)
        for i, p in enumerate(plan.plans):
            _window_entry(p, f"b{i}_", arrays, meta)
    elif isinstance(plan, CompositePlan):
        meta["kind"] = "composite"
        meta["n_levels"] = len(plan.plans)
        meta["num_rows"] = plan.num_rows
        meta["num_cols"] = plan.num_cols
        for i, p in enumerate(plan.plans):
            _window_entry(p, f"l{i}_", arrays, meta)
        if plan.tail is not None:
            meta["tail"] = {"num_rows": plan.tail.num_rows,
                            "num_cols": plan.tail.num_cols,
                            "nnz": plan.tail.nnz}
            for name in _CSR_LEAVES:
                arrays["t_" + name] = np.asarray(getattr(plan.tail, name))
    elif type(plan).__name__ == "ReorderedPlan":
        meta["kind"] = "reordered"
        meta["num_rows"] = plan.num_rows
        meta["num_cols"] = plan.num_cols
        arrays["r_col_src"] = np.asarray(plan.col_src)
        arrays["r_row_src"] = np.asarray(plan.row_src)
        if isinstance(plan.inner, BandedPlan):
            meta["inner_kind"] = "banded"
            meta["n_bands"] = len(plan.inner.plans)
            meta["inner_shape"] = [plan.inner.num_rows, plan.inner.num_cols]
            meta["band_rows"] = list(plan.inner.band_rows)
            for i, p in enumerate(plan.inner.plans):
                _window_entry(p, f"b{i}_", arrays, meta)
        else:
            meta["inner_kind"] = "window_ell"
            _window_entry(plan.inner, "p_", arrays, meta)
    else:
        raise InvalidFormatError(
            f"save_plan: unsupported plan type {type(plan).__name__}")
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    try:
        with open(path, "wb") as f:
            np.savez(f, **arrays)
    except OSError as e:
        raise FileIOError(str(e)) from e


def load_plan(path: str, device=None):
    """Load a plan saved by :func:`save_plan`; leaves are placed on
    ``device`` (default device when ``None``)."""
    from .csr import DeviceCSR
    from .kernels.window_ell import CompositePlan

    put = (lambda a: jax.device_put(a, device)) if device is not None \
        else jax.device_put
    try:
        ctx = np.load(path, allow_pickle=False)
    except OSError as e:
        raise FileIOError(str(e)) from e
    except Exception as e:  # corrupt/non-npz content (ValueError,
        # zipfile.BadZipFile, ...) — keep the library's error taxonomy
        raise InvalidFormatError(f"{path}: not a tpu_spmv plan file "
                                 f"({e})") from e
    with ctx as z:
        if "__meta__" not in z:
            raise InvalidFormatError(f"{path}: not a tpu_spmv plan file")
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        if meta.get("version", 0) > _VERSION:
            raise InvalidFormatError(
                f"{path}: plan format v{meta['version']} is newer than "
                f"this library (v{_VERSION})")
        kind = meta.get("kind")
        if kind == "window_ell":
            return _window_from("p_", z, meta, put)
        if kind == "banded":
            from .kernels.window_ell import BandedPlan

            return BandedPlan(
                plans=tuple(_window_from(f"b{i}_", z, meta, put)
                            for i in range(meta["n_bands"])),
                num_rows=meta["num_rows"], num_cols=meta["num_cols"],
                band_rows=tuple(meta.get("band_rows", ())))
        if kind == "strips":
            from .kernels.strips import StripPlan
            from .kernels.window_ell import BandedPlan

            plans = []
            for i, k in enumerate(meta["strip_kinds"]):
                if k == "banded":
                    nr, nc = meta[f"s{i}_shape"]
                    plans.append(BandedPlan(
                        plans=tuple(_window_from(f"s{i}b{j}_", z, meta, put)
                                    for j in range(meta[f"s{i}_n_bands"])),
                        num_rows=nr, num_cols=nc,
                        band_rows=tuple(meta[f"s{i}_band_rows"])))
                else:
                    plans.append(_window_from(f"s{i}_", z, meta, put))
            return StripPlan(plans=tuple(plans),
                             num_rows=meta["num_rows"],
                             num_cols=meta["num_cols"],
                             bounds=tuple(tuple(b)
                                          for b in meta["bounds"]))
        if kind == "reordered":
            from .kernels.reorder import ReorderedPlan
            from .kernels.window_ell import BandedPlan

            if meta["inner_kind"] == "banded":
                nr, nc = meta["inner_shape"]
                inner = BandedPlan(
                    plans=tuple(_window_from(f"b{i}_", z, meta, put)
                                for i in range(meta["n_bands"])),
                    num_rows=nr, num_cols=nc,
                    band_rows=tuple(meta.get("band_rows", ())))
            else:
                inner = _window_from("p_", z, meta, put)
            return ReorderedPlan(
                inner=inner,
                col_src=put(jnp.asarray(z["r_col_src"])),
                row_src=put(jnp.asarray(z["r_row_src"])),
                num_rows=meta["num_rows"], num_cols=meta["num_cols"])
        if kind == "composite":
            plans = tuple(_window_from(f"l{i}_", z, meta, put)
                          for i in range(meta["n_levels"]))
            tail = None
            if "tail" in meta:
                t = meta["tail"]
                tail = DeviceCSR(
                    values=put(jnp.asarray(z["t_values"])),
                    col_indices=put(jnp.asarray(z["t_col_indices"])),
                    row_ptrs=put(jnp.asarray(z["t_row_ptrs"])),
                    row_ids=put(jnp.asarray(z["t_row_ids"])),
                    num_rows=t["num_rows"], num_cols=t["num_cols"],
                    nnz=t["nnz"])
            return CompositePlan(plans=plans, tail=tail,
                                 num_rows=meta["num_rows"],
                                 num_cols=meta["num_cols"])
        raise InvalidFormatError(f"{path}: unknown plan kind {kind!r}")
