"""JOIN execution: materialisation strategies and join-level rewrites.

Split out of engine/executor.py (same subsystem, own module): the
single-program sort-merge / dense-phase-1 / probe-preserving joins, the
mesh route through the distributed shuffle join, LEFT OUTER semantics,
the materialized-join cache, and the eager-aggregation rewrite
(aggregate pushdown through joins).  See each function's docstring for
the design rationale and reference lineage (warpdb.hpp:22-23: the
reference parsed joins but never executed them).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import UnsupportedError, ValidationError
from ..frontend.ast import (
    Aggregation,
    Join,
    AggregationType,
    Alias,
    BinaryOp,
    CaseWhen,
    Constant,
    FunctionCall,
    GroupBy,
    OrderBy,
    Query,
    Variable,
    unalias,
    walk,
)
from ..ops.join import (
    dense_select_sweep,
    join_gather_indices,
    join_match_counts,
    join_match_counts_dense,
)
from ..storage.table import DeviceTable
from .compiler import _as_f32, get_or_compile, schema_signature


def _next_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


# ---------------------------------------------------------------------------
# JOIN materialisation
# ---------------------------------------------------------------------------


def _equality_pairs(cond: Node) -> list[tuple[Variable, Variable]]:
    """Flatten ``a = b [AND c = d …]`` into column-equality pairs."""
    if isinstance(cond, BinaryOp) and cond.op == "&&":
        return _equality_pairs(cond.left) + _equality_pairs(cond.right)
    if (
        isinstance(cond, BinaryOp)
        and cond.op in ("=", "==")
        and isinstance(cond.left, Variable)
        and isinstance(cond.right, Variable)
    ):
        return [(cond.left, cond.right)]
    raise UnsupportedError(
        "JOIN conditions must be column equalities joined with AND "
        "(a.x = b.y [AND ...])"
    )


def _resolve_column(cols: dict, var: Variable) -> jax.Array:
    arr = cols.get(var.name)
    if arr is None:
        arr = cols.get(var.unqualified)
    if arr is None:
        raise ValidationError(f"Unknown column: {var.name}")
    return arr


def _resolve_join_sides(left, right, right_name, pairs):
    """Assign each equality pair's variables to the probe (left) / build
    (right) side: a qualifier matching the right table name binds right;
    otherwise left wins, then right.  Returns [(left_var, right_var)]."""

    def side_of(var: Variable):
        if var.qualifier == right_name and (
            var.unqualified in right.columns or var.name in right.columns
        ):
            return "right"
        if var.name in left.columns or var.unqualified in left.columns:
            return "left"
        if var.name in right.columns or var.unqualified in right.columns:
            return "right"
        raise ValidationError(f"Unknown column: {var.name}")

    out = []
    for a, b in pairs:
        sa, sb = side_of(a), side_of(b)
        if {sa, sb} != {"left", "right"}:
            # Same-side equality (e.g. self-join on the same column
            # name): treat left occurrence as probe, right as build.
            out.append((a, b))
        else:
            out.append((a if sa == "left" else b, b if sb == "right" else a))
    return out


def _translated_right_key(left, right, left_var, right_var):
    """Resolve one pair's key arrays; re-express a string build key's
    codes under the probe side's vocabulary (absent strings → -1: match
    nothing).  Returns (lkey_raw, rkey_raw)."""
    lkey_raw = _resolve_column(left.columns, left_var)
    rkey_raw = _resolve_column(right.columns, right_var)
    lvocab = left.dicts.get(left_var.name) if left.dicts else None
    if lvocab is None and left.dicts:
        lvocab = left.dicts.get(left_var.unqualified)
    rvocab = right.dicts.get(right_var.name) if right.dicts else None
    if rvocab is None and right.dicts:
        rvocab = right.dicts.get(right_var.unqualified)
    if (lvocab is None) != (rvocab is None):
        v = lvocab if lvocab is not None else rvocab
        if getattr(v, "dtype", None) is None or v.dtype.kind not in "iu":
            raise ValidationError(
                "JOIN condition compares a string column with a numeric "
                "column"
            )
        # Wide-int64 (dictionary-coded) key joined against a RAW numeric
        # key: the raw side's values are pulled to host (O(right) — the
        # build side) and re-expressed so both sides match exactly.
        import numpy as np

        if lvocab is not None:
            # Probe coded, build raw: encode build values under the
            # probe vocabulary (absent values → code -1: match nothing).
            rv = np.asarray(rkey_raw)
            rv = rv.astype(np.float64) if rv.dtype.kind == "f" else (
                rv.astype(np.int64)
            )
            pos = np.clip(
                np.searchsorted(lvocab, rv), 0, max(len(lvocab) - 1, 0)
            )
            hit = lvocab[pos] == rv if len(lvocab) else np.zeros_like(
                pos, bool
            )
            rkey_raw = jnp.asarray(
                np.where(hit, pos, -1).astype(np.int32)
            )
        else:
            # Probe raw, build coded: decode build codes to values;
            # values outside int32 can never match an i32 probe — map
            # them to a sentinel PROVABLY outside the probe's stats
            # range so they match nothing.
            rcodes = np.asarray(rkey_raw).astype(np.int64)
            idx = np.clip(rcodes, 0, max(len(rvocab) - 1, 0))
            vals = (
                rvocab[idx] if len(rvocab) else np.zeros_like(idx)
            )
            miss = (
                (rcodes < 0)
                | (vals < -(2**31))
                | (vals > 2**31 - 1)
            )
            st = left.stats.get(left_var.name) or left.stats.get(
                left_var.unqualified
            )
            probe_float = jnp.issubdtype(lkey_raw.dtype, jnp.floating)
            if probe_float:
                # The join compares in f32, so the sentinel must be an
                # EXACT f32 value strictly outside the probe's range —
                # an integer like max+1 can round back onto the max
                # (ulp at 2^25 is 4) and fabricate matches.
                if st is not None and st.max is not None and np.isfinite(
                    st.max
                ):
                    sent = float(
                        np.nextafter(np.float32(st.max), np.float32(np.inf))
                    )
                elif st is not None and st.min is not None and np.isfinite(
                    st.min
                ):
                    sent = float(
                        np.nextafter(
                            np.float32(st.min), np.float32(-np.inf)
                        )
                    )
                else:
                    raise ValidationError(
                        "JOIN between a wide-int64 key and an unbounded "
                        "float key is not supported; load both sides as "
                        "int64"
                    )
                rkey_raw = jnp.asarray(
                    np.where(miss, sent, vals).astype(np.float32)
                )
                return lkey_raw, rkey_raw
            if st is not None and st.max is not None and st.max < 2**31 - 1:
                sent = int(st.max) + 1
            elif (
                st is not None and st.min is not None
                and st.min > -(2**31)
            ):
                sent = int(st.min) - 1
            else:
                raise ValidationError(
                    "JOIN between a wide-int64 key and a full-range "
                    "numeric key is not supported; load both sides as "
                    "int64"
                )
            rkey_raw = jnp.asarray(
                np.where(miss, sent, vals).astype(np.int32)
            )
        return lkey_raw, rkey_raw
    if lvocab is not None:
        from ..storage.strings import vocab_mapping

        mapping = vocab_mapping(rvocab, lvocab)
        rkey_raw = jnp.take(
            jnp.asarray(mapping), rkey_raw.astype(jnp.int32), mode="clip"
        )
    return lkey_raw, rkey_raw


def _join_key_pair(lkey_raw, rkey_raw):
    """Key representation for one equi-join pair: both sides integer →
    keep RAW int32 (matching happens in int_sort_key u32 space — exact
    beyond 2^24, where an f32 cast would produce false matches);
    anything else evaluates f32 on both sides as before."""
    int_l = jnp.issubdtype(lkey_raw.dtype, jnp.integer)
    int_r = jnp.issubdtype(rkey_raw.dtype, jnp.integer)
    if int_l and int_r:
        return lkey_raw.astype(jnp.int32), rkey_raw.astype(jnp.int32)
    return _as_f32(lkey_raw), _as_f32(rkey_raw)


def _materialize_join_distributed(
    left, right, right_name, pairs, needed, mesh, kind: str = "inner"
) -> DeviceTable:
    """Mesh route for one equi-join: resolve sides + string-key vocab
    translation here (on the resharded right table, so the translated
    key arrays match its layout), then hand off to the shuffle join.
    Composite keys ride as tuples; supports everything the local join
    does (VERDICT r1 item 2)."""
    from ..parallel.dist_join import distributed_join_table
    from ..parallel.sharded import _ensure_sharded

    left = _ensure_sharded(left, mesh)
    right = _ensure_sharded(right, mesh)

    def _resolved_name(cols, var):
        if var.name in cols:
            return var.name
        if var.unqualified in cols:
            return var.unqualified
        raise ValidationError(f"Unknown column: {var.name}")

    left_key_names = []
    right_key_arrays = []
    for left_var, right_var in _resolve_join_sides(
        left, right, right_name, pairs
    ):
        _lk, rkey_raw = _translated_right_key(left, right, left_var, right_var)
        left_key_names.append(_resolved_name(left.columns, left_var))
        right_key_arrays.append(rkey_raw)

    def _wanted(name: str, qual: str) -> bool:
        if needed is None:
            return True
        return name in needed or qual in needed

    left_payload = [
        n for n in left.columns if needed is None or n in needed
    ]
    right_payload = [
        n for n in right.columns if _wanted(n, f"{right_name}.{n}")
    ]
    return distributed_join_table(
        left, right, right_name, left_key_names, right_key_arrays,
        left_payload, right_payload, mesh, kind=kind,
    )


def _materialize_join(
    left: DeviceTable,
    right: DeviceTable,
    right_name: str,
    cond: Node,
    needed: Optional[set] = None,
    mesh=None,
    kind: str = "inner",
) -> DeviceTable:
    """Execute one inner equi-join, producing a new padded DeviceTable.

    Makes real what the reference only parsed (warpdb.hpp:22-23).
    ``needed`` (projection pushdown) restricts the gather to columns the
    query actually references — without it every column of both sides is
    materialised, which on wide tables multiplies HBM traffic.

    With a multi-device ``mesh``, the join routes through the
    hash-partitioned all-to-all shuffle join (parallel/dist_join.py):
    local sorts over N/P rows + two O(N/P)-per-link exchanges instead of
    global sorts over sharded arrays.

    Results memoise per probe-table instance (LRU, config
    ``join_cache_entries``): device tables are immutable, so the same
    (build table, condition, projected columns) join can never go stale
    — repeated star-schema queries skip the join entirely."""
    from ..config import get_config

    # CROSS JOIN (cond None): the cartesian product IS an equi-join on
    # a constant key — every probe row matches every build row — so the
    # whole machinery below (dense phase 1, expansion, projection
    # pushdown, memo) is reused with one synthetic all-zero key pair.
    pairs = [] if kind == "cross" else _equality_pairs(cond)

    cache_cap = get_config().join_cache_entries
    memo = None
    mkey = None
    if cache_cap > 0:
        memo = getattr(left, "_join_memo", None)
        if memo is None:
            from collections import OrderedDict

            memo = left._join_memo = OrderedDict()
        mkey = (
            _table_uid(right), right_name,
            "<cross>" if cond is None else cond.canonical(), kind,
            None if needed is None else frozenset(needed),
            None if mesh is None else int(mesh.devices.size),
        )
        hit = memo.get(mkey)
        if hit is not None:
            memo.move_to_end(mkey)
            # keep the build table alive so its uid cannot be reused
            _cached, _right_ref = hit
            return _cached

    if kind in ("right", "full"):
        # RIGHT = INNER plus build-side misses; FULL = LEFT plus
        # build-side misses.  The base join reuses every existing path
        # (memo, mesh route, lookup/dense fast paths); the tail appends
        # the unmatched build rows detected by a swapped phase 1.
        base_kind = "inner" if kind == "right" else "left"
        base = _materialize_join(
            left, right, right_name, cond, needed=needed, mesh=mesh,
            kind=base_kind,
        )
        out = _append_build_misses(base, left, right, right_name, pairs)
        if memo is not None:
            memo[mkey] = (out, right)
            while len(memo) > cache_cap:
                memo.popitem(last=False)
        return out

    if mesh is not None and int(mesh.devices.size) > 1 and pairs:
        # (CROSS joins stay single-program: hash-partitioning a
        # constant key would land every row on one device anyway.)
        out = _materialize_join_distributed(
            left, right, right_name, pairs, needed, mesh, kind
        )
        if memo is not None:
            memo[mkey] = (out, right)
            while len(memo) > cache_cap:
                memo.popitem(last=False)
        return out

    out = _materialize_join_local(
        left, right, right_name, pairs, needed, kind
    )
    if memo is not None:
        memo[mkey] = (out, right)
        while len(memo) > cache_cap:
            memo.popitem(last=False)
    return out


_TABLE_UID = [0]


def _table_uid(table) -> int:
    """Stable identity for a DeviceTable instance (id() can be reused
    after garbage collection; this cannot)."""
    uid = getattr(table, "_uid", None)
    if uid is None:
        _TABLE_UID[0] += 1
        uid = table._uid = _TABLE_UID[0]
    return uid


def _left_fill_stats(st, is_dict: bool, n_miss: int):
    """Adjust a build-side column's carried stats for LEFT-join fill
    values: numeric columns gain a NaN (null_count+1 keeps the range
    gates honest); dictionary columns extend their code range to the
    miss code -1 so dense grouping gives misses their own slot."""
    if n_miss <= 0:
        return st
    from ..storage.table import ColumnStats

    if is_dict:
        return ColumnStats(min=-1.0, max=st.max, null_count=st.null_count)
    return ColumnStats(
        min=st.min, max=st.max, null_count=st.null_count + 1
    )


def _semicompact_join(
    left: DeviceTable,
    right: DeviceTable,
    right_name: str,
    phase1,
    total: int,
    dense_k: int,
    lcols_in: dict,
    _wanted,
) -> DeviceTable:
    """Probe-compacting unique-key INNER join (r3).

    Phase 1 proved ``counts <= 1`` (unique build keys) but not every
    probe row matched — the classic star-schema shape after a selective
    dimension filter (TPC-H q3: only ~9% of lineitem rows survive the
    filtered-orders join).  The general path would run the full
    expansion machinery (ownership fill + capacity gathers + windowed
    take) to emit what is just a SUBSET of the probe table; instead,
    compact the probe to its matched positions and gather both sides at
    the compacted size:

    * matched positions sort to the front under an ascending position
      key (order-preserving → deterministic probe-order output);
    * ONE stacked 2-D take pulls every needed probe column plus the
      per-row build slot (``phase1.lo`` rides the same index);
    * build columns gather through the sorted-build permutation at the
      compacted size (or the tiny-build compare-select sweep).

    Zero extra relay syncs: the output capacity rides the ``total``
    scalar phase 1 already shipped.  Downstream operators (later joins,
    GROUP BY, WHERE) then scan ``total`` rows instead of ``n_probe`` —
    at a 9% match rate that is an 11x cut in every later pass.
    """
    # Power-of-two buckets for compile reuse, clamped to the probe's
    # padded length (which is a 1024-multiple, so the stacked 2-D take
    # stays lane-divisible even when the clamp wins).
    capacity = min(
        max(_next_pow2(max(total, 1)), 1024), left.padded_rows
    )
    rcols_in = {
        name: arr
        for name, arr in right.columns.items()
        if _wanted(name, f"{right_name}.{name}")
    }
    key = (
        "join_semicompact",
        schema_signature(lcols_in),
        schema_signature(rcols_in),
        left.padded_rows,
        right.padded_rows,
        capacity,
        dense_k,
    )

    def build():
        from ..ops.join import stacked_take

        lnames = list(lcols_in)
        rnames = list(rcols_in)

        @jax.jit
        def kernel(p1, lcols, rcols, n_left):
            n_pad = p1.lo.shape[0]
            pos_all = jnp.arange(n_pad, dtype=jnp.int32)
            matched = jnp.logical_and(pos_all < n_left, p1.counts > 0)
            okey = jnp.where(matched, pos_all, jnp.int32(0x7FFFFFFF))
            (pos_s,) = lax.sort((okey,), num_keys=1, is_stable=False)
            pos = jnp.clip(pos_s[:capacity], 0, n_pad - 1)
            out_valid = (
                jnp.arange(capacity, dtype=jnp.int32) < p1.total
            )
            # Probe columns + the build slot share ONE stacked take.
            slot_src = jnp.clip(p1.lo, 0, p1.build_order.shape[0] - 1)
            taken = stacked_take(
                tuple(lcols[n] for n in lnames) + (slot_src,),
                pos,
                out_valid,
            )
            lout = dict(zip(lnames, taken[: len(lnames)]))
            slot = taken[len(lnames)]
            if dense_k:
                # Tiny build side: virtual (capacity, K) compare-select
                # sweep beats per-row gathers (same trade as the lookup
                # join's dense path).
                taken_r = dense_select_sweep(
                    tuple(rcols[n][p1.build_order] for n in rnames),
                    slot, out_valid, dense_k,
                )
                rout = dict(zip(rnames, taken_r))
            else:
                perms = tuple(
                    rcols[n][p1.build_order] for n in rnames
                )
                rtaken = stacked_take(perms, slot, out_valid)
                rout = dict(zip(rnames, rtaken))
            return lout, rout

        return kernel

    lout, rout = get_or_compile(key, build)(
        phase1, lcols_in, rcols_in, jnp.int32(left.num_rows)
    )
    new_cols = dict(lout)
    for name, arr in rout.items():
        new_cols[f"{right_name}.{name}"] = arr
        new_cols.setdefault(name, arr)
    dtypes = {n: dt for n, dt in left.dtypes.items()}
    dicts = {n: v for n, v in left.dicts.items()}
    for name, dt in right.dtypes.items():
        dtypes[f"{right_name}.{name}"] = dt
        dtypes.setdefault(name, dt)
    for name, vocab in right.dicts.items():
        dicts[f"{right_name}.{name}"] = vocab
        dicts.setdefault(name, vocab)
    # Row-subset outputs keep both sides' stats verbatim: every bound is
    # a superset of the surviving rows' range (stats gates are
    # monotone-safe on supersets).
    stats = {n: st for n, st in left.stats.items()}
    for name, st in right.stats.items():
        stats[f"{right_name}.{name}"] = st
        stats.setdefault(name, st)
    return DeviceTable(
        new_cols, dtypes, total, capacity, stats=stats, dicts=dicts
    )


def _materialize_join_local(
    left: DeviceTable,
    right: DeviceTable,
    right_name: str,
    pairs,
    needed: Optional[set],
    kind: str = "inner",
) -> DeviceTable:
    """Single-program equi-join (the mesh route and the join memo live
    in :func:`_materialize_join`).  ``kind="left"`` keeps unmatched
    probe rows: emission counts become ``max(matches, 1)`` and the
    missing build-side values fill NaN (string codes -1)."""
    lkeys = []
    rkeys = []
    pair_canons = []
    for left_var, right_var in _resolve_join_sides(
        left, right, right_name, pairs
    ):
        lkey_raw, rkey_raw = _translated_right_key(
            left, right, left_var, right_var
        )
        lk, rk = _join_key_pair(lkey_raw, rkey_raw)
        lkeys.append(lk)
        rkeys.append(rk)
        pair_canons.append((left_var.canonical(), right_var.canonical()))
    if not pairs:
        # CROSS JOIN: one synthetic all-zero key — every valid probe
        # row matches every valid build row.
        lkeys.append(jnp.zeros((left.padded_rows,), jnp.float32))
        rkeys.append(jnp.zeros((right.padded_rows,), jnp.float32))
        pair_canons.append(("<cross>", "<cross>"))

    # Dimension-table fast path: a single-key join against a small build
    # side replaces the two full-width probe∪build sorts with a virtual
    # (N, K) VPU sweep (ops/join.join_match_counts_dense).  K is the
    # power-of-two bucket over the build row count, so each bucket
    # compiles once.
    from ..config import get_config

    dense_k = 0
    if len(pairs) <= 1:  # single key (CROSS uses the synthetic key)
        k_cap = max(_next_pow2(max(right.num_rows, 1)), 8)
        if k_cap <= get_config().join_dense_build_max:
            dense_k = k_cap

    key = (
        "join_phase1_v3",
        schema_signature(left.columns),
        schema_signature(right.columns),
        tuple(pair_canons),
        dense_k,
    )

    def build_phase1():
        @jax.jit
        def phase1(lks, rks, n_left, n_right):
            lmask = jnp.arange(lks[0].shape[0], dtype=jnp.int32) < n_left
            rmask = jnp.arange(rks[0].shape[0], dtype=jnp.int32) < n_right
            if dense_k:
                p1 = join_match_counts_dense(
                    lks[0], lmask, rks[0], rmask, dense_k
                )
            else:
                p1 = join_match_counts(tuple(lks), lmask, tuple(rks), rmask)
            # 1:1 detector: when no probe row matches more than one build
            # row AND every valid probe row matches, the join degenerates
            # to a per-row lookup (see the probe-preserving path below).
            # n_miss (valid probe rows with no match) sizes LEFT joins.
            n_miss = jnp.sum(
                jnp.logical_and(lmask, p1.counts == 0).astype(jnp.int32)
            )
            # Fan-out extremes over VALID probe rows: kmin == kmax
            # detects the uniform expansion (fixed-fan-out dimension
            # joins) that skips the windowed kernel AND its span gate
            # (ops/pallas_expand.uniform_expand).
            kmax = jnp.max(jnp.where(lmask, p1.counts, 0))
            kmin = jnp.min(
                jnp.where(lmask, p1.counts, jnp.int32(2**31 - 1))
            )
            return p1, jnp.all(p1.counts <= 1), n_miss, kmin, kmax

        return phase1

    phase1, one2one_dev, n_miss_dev, kmin_dev, kmax_dev = get_or_compile(
        key, build_phase1
    )(
        tuple(lkeys), tuple(rkeys),
        jnp.int32(left.num_rows), jnp.int32(right.num_rows),
    )
    # ONE batched host sync for every phase-1 scalar (each separate
    # fetch pays a full relay RTT).
    total, one2one, n_miss_all, kmin, kmax = (
        jax.device_get(
            (phase1.total, one2one_dev, n_miss_dev, kmin_dev, kmax_dev)
        )
    )
    total = int(total)
    n_miss = int(n_miss_all) if kind == "left" else 0

    if bool(one2one) and (
        kind == "left" or total == left.num_rows
    ):
        # Probe-preserving lookup join: every valid probe row matches
        # exactly one build row, so the output IS the probe table (all
        # left columns carried by reference — zero copies, zero gathers)
        # plus one gather per referenced build column through the
        # sorted-build permutation.  No expansion pass, no output
        # re-materialisation — the star-schema join at the cost of a
        # column lookup.
        rcols_in = {
            name: arr
            for name, arr in right.columns.items()
            if needed is None
            or name in needed
            or f"{right_name}.{name}" in needed
        }
        lkey2 = (
            "join_lookup",
            schema_signature(rcols_in),
            left.padded_rows,
            right.padded_rows,
            dense_k,
            kind,
        )

        def build_lookup():
            from ..ops.join import stacked_take

            rnames = list(rcols_in)

            @jax.jit
            def lookup(p1, rcols, n_left):
                n_pad = p1.lo.shape[0]
                valid = jnp.arange(n_pad, dtype=jnp.int32) < n_left
                if kind == "left":
                    # LEFT lookup: unmatched probe rows keep their slot
                    # clipped (value discarded) and fill NaN / code -1.
                    row_matched = jnp.logical_and(valid, p1.counts > 0)
                else:
                    row_matched = None
                n_build = p1.build_order.shape[0]
                slot = jnp.clip(p1.lo, 0, n_build - 1)
                perm = tuple(rcols[n][p1.build_order] for n in rnames)
                if dense_k:
                    # Tiny build side: virtual (N, K) compare-select
                    # sweep instead of per-row gathers (ops/join.py
                    # dense_select_sweep for the measured trade).
                    taken = dense_select_sweep(
                        perm, slot, valid, dense_k
                    )
                else:
                    taken = stacked_take(perm, slot, valid)
                if row_matched is not None:
                    filled = []
                    for n, v in zip(rnames, taken):
                        if v.dtype == jnp.int32:
                            fill = jnp.int32(-1)
                        else:
                            fill = jnp.float32(jnp.nan)
                        filled.append(jnp.where(row_matched, v, fill))
                    taken = tuple(
                        jnp.where(valid, v, jnp.zeros((), v.dtype))
                        for v in filled
                    )
                return dict(zip(rnames, taken))

            return lookup

        rtaken = get_or_compile(lkey2, build_lookup)(
            phase1, rcols_in, jnp.int32(left.num_rows)
        )
        new_cols = dict(left.columns)
        for name, arr in rtaken.items():
            new_cols[f"{right_name}.{name}"] = arr
            new_cols.setdefault(name, arr)
        dtypes = dict(left.dtypes)
        for name, dt in right.dtypes.items():
            dtypes[f"{right_name}.{name}"] = dt
            dtypes.setdefault(name, dt)
        dicts = dict(left.dicts)
        for name, vocab in right.dicts.items():
            dicts[f"{right_name}.{name}"] = vocab
            dicts.setdefault(name, vocab)
        stats = dict(left.stats)
        for name, st in right.stats.items():
            st2 = _left_fill_stats(st, name in right.dicts, n_miss)
            stats[f"{right_name}.{name}"] = st2
            stats.setdefault(name, st2)
        return DeviceTable(
            new_cols, dtypes, left.num_rows, left.padded_rows,
            stats=stats, dicts=dicts,
        )

    total_emit = total + n_miss
    capacity = max(_next_pow2(total_emit), 1024)

    # Projection pushdown: only gather columns the query references
    # (unqualified or via this join's qualifier).
    def _wanted(name: str, qual: str) -> bool:
        if needed is None:
            return True
        return name in needed or qual in needed

    lcols_in = {
        name: arr
        for name, arr in left.columns.items()
        if needed is None or name in needed
    }

    if bool(one2one) and kind == "inner" and total < left.num_rows:
        return _semicompact_join(
            left, right, right_name, phase1, total, dense_k,
            lcols_in, _wanted,
        )

    rcols_in = {
        name: arr
        for name, arr in right.columns.items()
        if _wanted(name, f"{right_name}.{name}")
    }

    # Fused windowed expansion (r3): when every output block's owner
    # rows fit the kernel's 2048-row window (dense expansions — most
    # inner joins), ops/pallas_expand.windowed_expand replaces BOTH the
    # scatter+cummax metadata fill and the capacity-sized random take
    # (measured 11.8x on the take alone at 2^26).  The verdict is a
    # host decision (one tiny kernel + scalar sync riding the same
    # protocol as the capacity count), so only ONE expansion program
    # compiles — no traced branch.
    # Uniform fan-out fast path: every valid probe row matched exactly
    # k build rows (phase1's kmin == kmax) — ownership (r // k) and
    # duplicate index (r % k) are analytic, so the expansion needs no
    # span gate, no scalar prefetch, and a CONSTANT selection matrix
    # (ops/pallas_expand.uniform_expand; measured ~8x over the windowed
    # kernel at 2^26 outputs).
    from ..ops.pallas_expand import uniform_expand_supported

    k_uniform = 0
    if (
        jax.default_backend() == "tpu"
        and kind == "inner"
        and int(kmin) == int(kmax)
        and int(kmax) >= 2
        and uniform_expand_supported(
            int(kmax), capacity, left.padded_rows
        )
    ):
        k_uniform = int(kmax)

    fused = False
    if k_uniform == 0 and (
        jax.default_backend() == "tpu"
        and capacity % 1024 == 0
        and left.padded_rows % 1024 == 0
    ):
        gate_key = (
            "join_expand_gate", left.padded_rows, capacity, kind,
        )

        def build_gate():
            from ..ops.pallas_expand import (
                expand_block_owners,
                expand_spans_ok,
            )

            @jax.jit
            def gate(p1, n_left):
                counts = p1.counts
                if kind == "left":
                    lmask = (
                        jnp.arange(counts.shape[0], dtype=jnp.int32)
                        < n_left
                    )
                    counts = jnp.where(lmask, jnp.maximum(counts, 1), 0)
                offsets = jnp.cumsum(counts) - counts
                total = jnp.sum(counts)
                p_lo, p_last = expand_block_owners(
                    offsets, capacity, total
                )
                return expand_spans_ok(p_lo, p_last)

            return gate

        fused = bool(
            jax.device_get(
                get_or_compile(gate_key, build_gate)(
                    phase1, jnp.int32(left.num_rows)
                )
            )
        )

    # Phase 2 fused with the payload gather: index expansion and every
    # column gather in one program, one dispatch.
    key2 = (
        "join_expand_gather",
        schema_signature(lcols_in),
        schema_signature(rcols_in),
        capacity,
        right_name,
        kind,
        dense_k,
        fused,
        k_uniform,
    )

    def build_expand_gather():
        # All column dtypes are 4-byte (f32 / i32 codes), so both sides
        # bitcast to u32 and ride ONE stacked (C, n) take each: TPU
        # gather cost is per-row dominated, so C columns in one take
        # cost about one column's separate gather (measured 4.4x for
        # C=4 at 2^25 rows).  The build side is pre-permuted into
        # sorted-build order (an n_build-sized shuffle) and indexed by
        # slot, skipping the build_order indirection gather entirely.
        lnames = list(lcols_in)
        rnames = list(rcols_in)

        def _bits(arr):
            return lax.bitcast_convert_type(arr, jnp.uint32)

        # Gather-free expansion metadata for dense build sides (packed
        # monotone streams; see ops/join.join_gather_indices).
        dp = (
            dense_k + 1
            if dense_k and left.padded_rows * (dense_k + 1) < 2**32
            else 0
        )

        @jax.jit
        def indices(p1, n_left):
            if kind == "left":
                lmask = (
                    jnp.arange(p1.counts.shape[0], dtype=jnp.int32) < n_left
                )
                emit = jnp.where(lmask, jnp.maximum(p1.counts, 1), 0)
                p1e = p1._replace(counts=emit, total=jnp.sum(emit))
                return join_gather_indices(
                    p1e, capacity, return_slot=True,
                    matched_counts=p1.counts, dense_pack=dp,
                )
            pidx, slot, valid = join_gather_indices(
                p1, capacity, return_slot=True, dense_pack=dp
            )
            return pidx, slot, valid, None

        def _take(m, idx):
            # 2-D index block keeps the gather output's minor dim 128-wide;
            # a flat index would emit a [capacity, C] intermediate whose
            # size-C minor dim tile-pads to 128 (64x HBM blowup at C=2).
            # Kept in its own program: fused with the index computation,
            # XLA's layout assignment re-materialises that padded form.
            t = jnp.take(m, idx.reshape(-1, 1024), axis=1)
            return t.reshape(m.shape[0], -1)

        @jax.jit
        def take_probe(cols_tuple, idx, valid):
            # General path only: dense expansions never reach here (the
            # host-gated fused windowed kernel serves them); sparse
            # matches genuinely need the random take.
            m = jnp.stack([_bits(c) for c in cols_tuple], axis=0)
            t = jnp.where(valid[None, :], _take(m, idx), jnp.uint32(0))
            return tuple(
                lax.bitcast_convert_type(t[i], c.dtype)
                for i, c in enumerate(cols_tuple)
            )

        @jax.jit
        def take_build(cols_tuple, slot, valid, order):
            if dense_k:
                # Tiny build side: virtual (N, K) compare-select sweep
                # instead of per-row gathers — ~0.7 s per column at
                # 2^26 output rows vs tens of ms (ops/join.py
                # dense_select_sweep).
                return dense_select_sweep(
                    tuple(c[order] for c in cols_tuple),
                    slot, valid, dense_k,
                )
            # Small-source gathers: per-column 1-D takes on columns
            # pre-permuted into sorted-build order (the stacked 2-D form
            # re-materialises the 64x-padded gather when the operand is
            # tiny, and take_along_axis is ~4x slower per column).
            return tuple(
                jnp.where(valid, c[order][slot], jnp.zeros((), c.dtype))
                for c in cols_tuple
            )

        @jax.jit
        def left_fill(rt_tuple, matched, valid):
            filled = []
            for v in rt_tuple:
                fill = (
                    jnp.int32(-1)
                    if v.dtype == jnp.int32
                    else jnp.float32(jnp.nan)
                )
                f = jnp.where(matched, v, fill)
                filled.append(jnp.where(valid, f, jnp.zeros((), v.dtype)))
            return tuple(filled)

        @jax.jit
        def indices_and_probe_uniform(p1, lcols):
            """Uniform fan-out k: owner = r // k, dup = r % k — pure
            analytic metadata around one constant-selection kernel."""
            from ..ops.pallas_expand import uniform_expand

            gather_cols = [lcols[n] for n in lnames] + [p1.lo]
            taken = uniform_expand(
                tuple(gather_cols), k=k_uniform, capacity=capacity
            )
            r = jnp.arange(capacity, dtype=jnp.int32)
            valid = r < p1.total
            lt = tuple(
                jnp.where(valid, t, jnp.zeros((), t.dtype))
                for t in taken[: len(lnames)]
            )
            lo_r = taken[len(lnames)]
            dup_j = r % k_uniform
            n_build = p1.build_order.shape[0]
            slot = jnp.clip(lo_r + dup_j, 0, n_build - 1)
            slot = jnp.where(valid, slot, 0)
            return lt, slot, valid

        @jax.jit
        def indices_and_probe_fused(p1, lcols, n_left):
            """Windowed-kernel expansion: ownership + probe/metadata
            gather in one Pallas pass (no fill scatter, no random
            take)."""
            from ..ops.pallas_expand import windowed_expand

            counts = p1.counts
            if kind == "left":
                lmask = (
                    jnp.arange(counts.shape[0], dtype=jnp.int32) < n_left
                )
                counts = jnp.where(lmask, jnp.maximum(counts, 1), 0)
            offsets = jnp.cumsum(counts) - counts
            total = jnp.sum(counts)
            gather_cols = [lcols[n] for n in lnames] + [p1.lo]
            if kind == "left":
                gather_cols.append(p1.counts)  # true match counts
            pidx, off_r, taken = windowed_expand(
                offsets, tuple(gather_cols), capacity, total=total
            )
            r = jnp.arange(capacity, dtype=jnp.int32)
            valid = r < total
            lt = tuple(
                jnp.where(valid, t, jnp.zeros((), t.dtype))
                for t in taken[: len(lnames)]
            )
            lo_r = taken[len(lnames)]
            dup_j = r - off_r
            n_build = p1.build_order.shape[0]
            slot = jnp.clip(lo_r + dup_j, 0, n_build - 1)
            slot = jnp.where(valid, slot, 0)
            matched = None
            if kind == "left":
                mc_r = taken[len(lnames) + 1]
                matched = jnp.logical_and(valid, dup_j < mc_r)
            return lt, slot, valid, matched

        def expand_gather(p1, lcols, rcols, n_left):
            if k_uniform:
                lt, slot, valid = indices_and_probe_uniform(p1, lcols)
                matched = None
            elif fused:
                lt, slot, valid, matched = indices_and_probe_fused(
                    p1, lcols, n_left
                )
            else:
                pidx, slot, valid, matched = indices(p1, n_left)
                lt = (
                    take_probe(
                        tuple(lcols[n] for n in lnames), pidx, valid
                    )
                    if lnames
                    else ()
                )
            out = {}
            for n, arr in zip(lnames, lt):
                out[n] = arr
            if rnames:
                rt = take_build(
                    tuple(rcols[n] for n in rnames), slot, valid,
                    p1.build_order,
                )
                if kind == "left":
                    rt = left_fill(rt, matched, valid)
                for n, arr in zip(rnames, rt):
                    out[f"{right_name}.{n}"] = arr
            return out

        return expand_gather

    new_cols = get_or_compile(key2, build_expand_gather)(
        phase1, lcols_in, rcols_in, jnp.int32(left.num_rows)
    )
    # Bare right-side names that don't collide stay addressable unqualified.
    for name in rcols_in:
        qual = f"{right_name}.{name}"
        if name not in new_cols and qual in new_cols:
            new_cols[name] = new_cols[qual]

    dtypes = dict(left.dtypes)
    for name, dt in right.dtypes.items():
        dtypes[f"{right_name}.{name}"] = dt
        dtypes.setdefault(name, dt)
    dicts = dict(left.dicts)
    for name, vocab in right.dicts.items():
        dicts[f"{right_name}.{name}"] = vocab
        dicts.setdefault(name, vocab)
    # Stats carry through: every joined value is drawn from its source
    # column, so the source min/max interval (and null flag) remains a
    # sound — merely conservative — bound.  Keeps the stats-gated fast
    # paths (dense GROUP BY, value-space top-k) live after a join.
    stats = dict(left.stats)
    for name, st in right.stats.items():
        st2 = _left_fill_stats(st, name in right.dicts, n_miss)
        stats[f"{right_name}.{name}"] = st2
        stats.setdefault(name, st2)
    return DeviceTable(
        new_cols, dtypes, total_emit, capacity, stats=stats, dicts=dicts
    )



def _append_build_misses(
    base: DeviceTable,
    left: DeviceTable,
    right: DeviceTable,
    right_name: str,
    pairs,
) -> DeviceTable:
    """RIGHT/FULL OUTER tail: append build rows with no probe match.

    ``base`` is the already-materialised INNER (for RIGHT) or LEFT (for
    FULL) join.  A swapped phase 1 (probe := build side) marks build
    rows whose key tuple matches no valid probe row; those rows compact
    to a pow2 bucket via one stable position sort and append after
    ``base``'s valid prefix.  Probe-side columns fill the engine's
    missing-value marker (NaN; int32 / string codes -1), mirroring the
    LEFT-join fill.  The reference parsed no OUTER join variants at all
    (expression.cpp:375-401, warpdb.hpp:22-23).

    Matching semantics are the sort-key semantics of the inner join
    (canonical NaN matches NaN); a build-side string key absent from
    the probe vocabulary translates to code -1 and lands here."""
    lkeys, rkeys, pair_canons = [], [], []
    for left_var, right_var in _resolve_join_sides(
        left, right, right_name, pairs
    ):
        lk, rk = _join_key_pair(
            *_translated_right_key(left, right, left_var, right_var)
        )
        lkeys.append(lk)
        rkeys.append(rk)
        pair_canons.append((left_var.canonical(), right_var.canonical()))

    akey = (
        "join_anti_mask",
        schema_signature(left.columns),
        schema_signature(right.columns),
        tuple(pair_canons),
    )

    def build_anti():
        @jax.jit
        def anti(lks, rks, n_left, n_right):
            lmask = jnp.arange(lks[0].shape[0], dtype=jnp.int32) < n_left
            rmask = jnp.arange(rks[0].shape[0], dtype=jnp.int32) < n_right
            p1 = join_match_counts(tuple(rks), rmask, tuple(lks), lmask)
            miss = jnp.logical_and(rmask, p1.counts == 0)
            return miss, jnp.sum(miss.astype(jnp.int32))

        return anti

    miss, n_miss_dev = get_or_compile(akey, build_anti)(
        tuple(lkeys), tuple(rkeys),
        jnp.int32(left.num_rows), jnp.int32(right.num_rows),
    )
    n_miss = int(n_miss_dev)
    if n_miss == 0:
        return base

    # Classify each output column: build-sourced names carry the miss
    # row's value; everything else (probe-sourced) takes the fill.
    spec = []
    rneeded: list[str] = []
    for name in base.columns:
        src = None
        if (
            name.startswith(right_name + ".")
            and name[len(right_name) + 1 :] in right.columns
        ):
            src = name[len(right_name) + 1 :]
        elif name not in left.columns and name in right.columns:
            src = name
        spec.append((name, src))
        if src is not None and src not in rneeded:
            rneeded.append(src)

    cap_miss = min(_next_pow2(n_miss), right.padded_rows)
    rcols_in = {n: right.columns[n] for n in rneeded}
    anti_cols: dict = {}
    if rneeded:
        ckey = (
            "join_anti_compact",
            schema_signature(rcols_in),
            right.padded_rows,
            cap_miss,
        )

        def build_compact():
            names = list(rcols_in)

            @jax.jit
            def compact(miss_mask, rcols):
                n_pad = miss_mask.shape[0]
                idx = jnp.arange(n_pad, dtype=jnp.int32)
                rank = jnp.where(miss_mask, 0, 1).astype(jnp.int32)
                # Stable position sort carrying every needed column's
                # bits: misses compact to the front in original row
                # order (same protocol as the filtered projection).
                ops = (rank, idx) + tuple(
                    lax.bitcast_convert_type(rcols[n], jnp.uint32)
                    for n in names
                )
                s = lax.sort(ops, num_keys=2, is_stable=True)
                return {
                    n: lax.bitcast_convert_type(
                        s[2 + i][:cap_miss], rcols[n].dtype
                    )
                    for i, n in enumerate(names)
                }

            return compact

        anti_cols = get_or_compile(ckey, build_compact)(miss, rcols_in)

    n1 = base.num_rows
    total = n1 + n_miss
    capacity = max(_next_pow2(total), 1024)
    okey = (
        "join_outer_concat",
        schema_signature(base.columns),
        tuple(spec),
        cap_miss,
        capacity,
    )

    def build_concat():
        @jax.jit
        def concat(bcols, acols, n_base, n_extra):
            r = jnp.arange(capacity, dtype=jnp.int32)
            j = jnp.arange(cap_miss, dtype=jnp.int32)
            pos = jnp.where(j < n_extra, n_base + j, capacity)
            out = {}
            for name, src in spec:
                b = bcols[name]
                take = min(b.shape[0], capacity)
                v = b[:take]
                if take < capacity:
                    v = jnp.concatenate(
                        [v, jnp.zeros((capacity - take,), v.dtype)]
                    )
                v = jnp.where(r < n_base, v, jnp.zeros((), v.dtype))
                if src is not None:
                    v = v.at[pos].set(acols[src], mode="drop")
                else:
                    fill = (
                        jnp.int32(-1)
                        if v.dtype == jnp.int32
                        else jnp.float32(jnp.nan)
                    )
                    in_tail = jnp.logical_and(r >= n_base, r < n_base + n_extra)
                    v = jnp.where(in_tail, fill, v)
                out[name] = v
            return out

        return concat

    new_cols = get_or_compile(okey, build_concat)(
        dict(base.columns), anti_cols, jnp.int32(n1), jnp.int32(n_miss)
    )

    stats = {}
    for name, src in spec:
        st = base.stats.get(name)
        if st is None:
            continue
        if src is None:
            stats[name] = _left_fill_stats(st, name in base.dicts, n_miss)
        else:
            stats[name] = st
    return DeviceTable(
        new_cols, dict(base.dtypes), total, capacity,
        stats=stats, dicts=dict(base.dicts),
    )


class _EjaBail(Exception):
    """Internal: the eager-join-aggregation rewrite does not apply."""


def _try_eager_join_aggregate(query, table, catalog, mesh):
    """Eager aggregation — aggregate pushdown through a join.

    ``SELECT AGG(e) FROM probe JOIN dim ON k = dim.k GROUP BY g`` where
    every aggregate factors across the join rewrites into a
    pre-aggregated build side plus a 1:1 lookup join:

    * ``SUM(p·b) = Σ_i p_i · S_b(k_i)`` — SUM of a probe-expr × build-col
      product becomes ``SUM(p · __eja_sum_b)``;
    * ``SUM(p) = Σ_i p_i · c(k_i)`` → ``SUM(p · __eja_cnt)``;
    * ``COUNT(e)`` → ``SUM(__eja_cnt)``; ``AVG`` = the two above divided;
    * ``MIN/MAX`` of probe-only exprs are duplicate-invariant (kept); of
      bare build columns they fold through per-key build MIN/MAX.

    The expansion join's output is O(matched pairs); the rewritten plan
    touches O(probe + distinct build keys) — measured 2.4 s → ~0.1 s on
    the 2^25×2-dup benchmark join.  Returns ``(query', catalog')`` with
    the build table replaced by its per-key aggregate, or None when the
    pattern doesn't apply (composite keys, build refs in keys/WHERE,
    non-factorable aggregates, COUNT(DISTINCT)/MEDIAN)."""
    from ..config import get_config

    if not get_config().eager_join_aggregation:
        return None
    if query.group_by is None or len(query.joins) != 1:
        return None
    join = query.joins[0]
    if getattr(join, "kind", "inner") != "inner":
        return None
    catalog = catalog or {}
    right = catalog.get(join.table, table)

    # Repeated identical queries reuse the rewritten plan AND the
    # pre-aggregated build table (immutable inputs, same instance-keyed
    # rationale as the join memo).
    memo = getattr(table, "_eja_memo", None)
    if memo is None:
        from collections import OrderedDict

        memo = table._eja_memo = OrderedDict()
    # canonical() is alias-insensitive (kernel-cache semantics), but the
    # memoised q2 carries output NAMES — two queries differing only by
    # ``AS`` aliases must not share an entry (same rule as the subquery
    # memo, executor._resolve_from_subquery).
    sel_names = tuple(
        s.name if isinstance(s, Alias) else None for s in query.select_list
    )
    mkey = (
        query.canonical(), sel_names, _table_uid(right),
        None if mesh is None else int(mesh.devices.size),
    )
    hit = memo.get(mkey)
    if hit is not None:
        memo.move_to_end(mkey)
        q2, dim2, _right_ref = hit
        catalog2 = dict(catalog)
        catalog2[join.table] = dim2
        return q2, catalog2
    try:
        pairs = _equality_pairs(join.condition)
    except UnsupportedError:
        return None
    if len(pairs) != 1:
        return None
    try:
        _lv, right_var = _resolve_join_sides(
            table, right, join.table, pairs
        )[0]
    except ValidationError:
        return None
    key_name = (
        right_var.name
        if right_var.name in right.columns
        else right_var.unqualified
    )

    def is_build(var: Variable) -> bool:
        if var.qualifier == join.table and (
            var.unqualified in right.columns or var.name in right.columns
        ):
            return True
        if var.name in table.columns or var.unqualified in table.columns:
            return False
        return var.name in right.columns or var.unqualified in right.columns

    def probe_only(node) -> bool:
        return all(
            not (isinstance(n, Variable) and is_build(n)) for n in walk(node)
        )

    for k in query.group_by.keys:
        if not probe_only(k):
            return None
    if query.where is not None and not probe_only(query.where):
        return None

    CNT = "__eja_cnt"
    partials: dict = {}  # alias -> ("count"|"sum"|"min"|"max", col name)

    def build_col_of(node):
        node = unalias(node)
        if isinstance(node, Variable) and is_build(node):
            return node
        return None

    def sum_rewrite(e):
        if probe_only(e):
            partials[CNT] = ("count", None)
            return Aggregation(
                AggregationType.SUM, BinaryOp("*", e, Variable(CNT))
            )
        b = build_col_of(e)
        if b is not None:
            alias = f"__eja_sum_{b.unqualified}"
            partials[alias] = ("sum", b.unqualified)
            return Aggregation(AggregationType.SUM, Variable(alias))
        if isinstance(e, BinaryOp) and e.op == "*":
            bl, br = build_col_of(e.left), build_col_of(e.right)
            if bl is not None and probe_only(e.right):
                p, b = e.right, bl
            elif br is not None and probe_only(e.left):
                p, b = e.left, br
            else:
                raise _EjaBail
            alias = f"__eja_sum_{b.unqualified}"
            partials[alias] = ("sum", b.unqualified)
            return Aggregation(
                AggregationType.SUM, BinaryOp("*", p, Variable(alias))
            )
        raise _EjaBail

    def rewrite_agg(n: Aggregation):
        if n.agg is AggregationType.COUNT:
            partials[CNT] = ("count", None)
            return Aggregation(AggregationType.SUM, Variable(CNT))
        if n.agg is AggregationType.SUM:
            return sum_rewrite(n.expr)
        if n.agg is AggregationType.AVG:
            s = sum_rewrite(n.expr)
            partials[CNT] = ("count", None)
            return BinaryOp(
                "/", s, Aggregation(AggregationType.SUM, Variable(CNT))
            )
        if n.agg in (AggregationType.MIN, AggregationType.MAX):
            if probe_only(n.expr):
                return n  # duplicate-invariant
            b = build_col_of(n.expr)
            if b is None:
                raise _EjaBail
            tag = "min" if n.agg is AggregationType.MIN else "max"
            alias = f"__eja_{tag}_{b.unqualified}"
            partials[alias] = (tag, b.unqualified)
            return Aggregation(n.agg, Variable(alias))
        raise _EjaBail  # COUNT_DISTINCT / MEDIAN are not mergeable

    def rw(node):
        if node is None:
            return None
        if isinstance(node, Alias):
            return Alias(rw(node.expr), node.name)
        if isinstance(node, Aggregation):
            return rewrite_agg(node)
        if isinstance(node, BinaryOp):
            return BinaryOp(node.op, rw(node.left), rw(node.right))
        if isinstance(node, CaseWhen):
            return CaseWhen(
                tuple(rw(c) for c in node.conditions),
                tuple(rw(v) for v in node.values),
                rw(node.default),
            )
        if isinstance(node, FunctionCall):
            return FunctionCall(node.name, tuple(rw(a) for a in node.args))
        if isinstance(node, Variable) and is_build(node):
            raise _EjaBail  # bare build ref outside an aggregate
        return node

    def rw_select(s):
        # The rewrite must not change user-visible column names: a
        # rewritten item keeps its ORIGINAL display name via an Alias
        # (plan choice is invisible in the result schema — without this,
        # ``AVG(v * d.w)`` came back named
        # ``(SUM((v[idx] * __eja_sum_w[idx])) / SUM(__eja_cnt[idx]))``).
        r = rw(s)
        if isinstance(s, Alias) or r.canonical() == s.canonical():
            return r
        name = s.canonical()
        if name.endswith("[idx]"):
            name = name[: -len("[idx]")]
        return Alias(r, name)

    try:
        new_select = [rw_select(s) for s in query.select_list]
        new_having = rw(query.having)
        new_order = None
        if query.order_by is not None:
            new_order = OrderBy(
                rw(query.order_by.expr),
                query.order_by.ascending,
                tuple(
                    OrderBy(rw(t.expr), t.ascending)
                    for t in query.order_by.then
                ),
            )
    except _EjaBail:
        return None
    if not partials:
        return None
    if any(a in table.columns for a in partials):
        return None  # improbable name collision with probe columns

    # Pre-aggregate the build side per join key through the engine
    # itself (dense/midrange/distributed group paths all apply).
    import copy as _copy

    q_dim = Query()
    q_dim.from_table = join.table
    q_dim.group_by = GroupBy((Variable(key_name),))
    sel = [Alias(Variable(key_name), key_name)]
    agg_of = {
        "count": AggregationType.COUNT,
        "sum": AggregationType.SUM,
        "min": AggregationType.MIN,
        "max": AggregationType.MAX,
    }
    for alias, (tag, col) in partials.items():
        expr = Constant("1") if col is None else Variable(col)
        sel.append(Alias(Aggregation(agg_of[tag], expr), alias))
    q_dim.select_list = sel

    from .executor import run_query_table

    out = run_query_table(q_dim, right, catalog=None, mesh=mesh)
    arrays = {}
    dtypes = {}
    key_vals = np.asarray(out[key_name], np.float32)
    key_dt = right.dtypes.get(key_name)
    if key_name in right.dicts:
        from ..storage.strings import decode_codes

        arrays[key_name] = np.asarray(
            decode_codes(key_vals, right.dicts[key_name]), dtype=object
        )
        dtypes[key_name] = key_dt
    elif key_dt is not None and key_dt.np_dtype is not None:
        arrays[key_name] = key_vals.astype(key_dt.np_dtype)
        dtypes[key_name] = key_dt
    else:
        arrays[key_name] = key_vals
    for alias in partials:
        arrays[alias] = np.asarray(out[alias], np.float32)

    from ..storage.table import HostTable

    dim2 = DeviceTable.from_host(
        HostTable.from_dict(arrays, dtypes=dtypes or None)
    )

    q2 = _copy.copy(query)
    q2.select_list = new_select
    q2.having = new_having
    q2.order_by = new_order
    memo[mkey] = (q2, dim2, right)
    while len(memo) > 4:
        memo.popitem(last=False)
    catalog2 = dict(catalog)
    catalog2[join.table] = dim2
    return q2, catalog2


def _split_join_residuals(query: Query) -> Query:
    """Theta joins (extension; the reference parses JOIN but never
    executes it, warpdb.hpp:22-23): split non-equality conjuncts out of
    INNER JOIN ON conditions.  ``ON a.k = b.k AND a.x < b.y`` runs the
    equi-join on the equality conjuncts, then the residual filters the
    joined rows through the ordinary WHERE machinery — exact for INNER
    joins (ON ≡ WHERE there).  An ON with NO equality conjuncts at all
    becomes CROSS JOIN + filter (a general theta join — the O(N·M)
    intermediate is inherent to the predicate).  Outer joins keep the
    equality-only contract: their ON decides *matching*, not row
    survival, so a residual cannot move to WHERE."""
    import dataclasses

    def conjuncts(n):
        if isinstance(n, BinaryOp) and n.op == "&&":
            return conjuncts(n.left) + conjuncts(n.right)
        return [n]

    def is_eq(c):
        return (
            isinstance(c, BinaryOp)
            and c.op in ("=", "==")
            and isinstance(c.left, Variable)
            and isinstance(c.right, Variable)
        )

    new_joins = []
    residuals: list[Node] = []
    changed = False
    for j in query.joins:
        if j.condition is None:
            new_joins.append(j)
            continue
        parts = conjuncts(j.condition)
        eq = [c for c in parts if is_eq(c)]
        res = [c for c in parts if not is_eq(c)]
        if not res:
            new_joins.append(j)
            continue
        if j.kind not in ("inner", "cross"):
            raise UnsupportedError(
                f"Non-equality {j.kind.upper()} JOIN conditions are not "
                "supported (outer-join ON decides matching; rewrite the "
                "residual predicate as WHERE if INNER semantics are "
                "intended)"
            )
        changed = True
        residuals.extend(res)
        if eq:
            cond: Optional[Node] = eq[0]
            for c in eq[1:]:
                cond = BinaryOp("&&", cond, c)
            new_joins.append(
                dataclasses.replace(j, condition=cond, kind="inner")
            )
        else:
            new_joins.append(
                dataclasses.replace(j, condition=None, kind="cross")
            )
    if not changed:
        return query
    import copy as _copy

    q2 = _copy.copy(query)
    q2.joins = new_joins
    where = query.where
    for r in residuals:
        where = r if where is None else BinaryOp("&&", where, r)
    q2.where = where
    return q2


def _lift_implicit_join_conditions(
    query: Query, table: DeviceTable, catalog: Optional[dict]
) -> Query:
    """SQL-89 implicit joins: ``FROM a, b WHERE a.k = b.k`` parses as a
    CROSS JOIN + WHERE; lift each WHERE equality conjunct that links one
    relation to the chain before it into that join's ON condition
    (making it an INNER equi-join), leaving the residue in WHERE.
    Without this the engine would materialise the full N·M cartesian
    product only to filter it straight back down.  A conjunct whose
    column resolution is ambiguous (a name in both scopes, or not a
    bare column equality) stays in WHERE — correct, just unlifted."""
    if query.where is None or not any(
        j.kind == "cross" and j.condition is None for j in query.joins
    ):
        return query
    catalog = catalog or {}

    def conjuncts(n):
        if isinstance(n, BinaryOp) and n.op == "&&":
            return conjuncts(n.left) + conjuncts(n.right)
        return [n]

    parts = conjuncts(query.where)
    used = [False] * len(parts)
    left_cols = set(table.columns)
    left_quals = {query.from_table}
    new_joins = []
    any_lifted = False
    for j in query.joins:
        right = catalog.get(j.table, table)
        rcols = set(right.columns)
        if j.kind != "cross" or j.condition is not None:
            new_joins.append(j)
            left_cols |= rcols
            left_quals.add(j.table)
            continue

        def side_of(v, rcols=rcols, jt=j.table):
            if v.qualifier is not None:
                if v.qualifier == jt:
                    return "right"
                if v.qualifier in left_quals:
                    return "left"
                return None
            in_r = v.name in rcols
            in_l = v.name in left_cols
            if in_r and not in_l:
                return "right"
            if in_l and not in_r:
                return "left"
            return None  # ambiguous or unknown

        picked = []
        for i, c in enumerate(parts):
            if used[i]:
                continue
            if (
                isinstance(c, BinaryOp)
                and c.op in ("==", "=")
                and isinstance(c.left, Variable)
                and isinstance(c.right, Variable)
            ):
                sides = {side_of(c.left), side_of(c.right)}
                if sides == {"left", "right"}:
                    picked.append(c)
                    used[i] = True
        if picked:
            cond = picked[0]
            for c in picked[1:]:
                cond = BinaryOp("&&", cond, c)
            new_joins.append(
                Join(j.table, cond, kind="inner", source=j.source)
            )
            any_lifted = True
        else:
            new_joins.append(j)
        left_cols |= rcols
        left_quals.add(j.table)
    if not any_lifted:
        return query
    import copy as _copy

    q2 = _copy.copy(query)
    q2.joins = new_joins
    rest = [c for i, c in enumerate(parts) if not used[i]]
    w = None
    for c in rest:
        w = c if w is None else BinaryOp("&&", w, c)
    q2.where = w
    return q2


def _pushdown_join_where(
    query: Query, table: DeviceTable, catalog: Optional[dict], mesh=None
) -> tuple[Query, DeviceTable]:
    """Probe-side predicate pushdown below the join chain (classic
    optimizer rewrite; the reference never executed joins at all,
    warpdb.hpp:22-23).  When every WHERE column resolves to the probe
    relation, the probe compacts to the matching rows BEFORE the join
    materialises — the join's sorts, expansions, and gathers then run on
    s·N rows instead of N.  Order-preserving (stable position sort +
    one stacked multi-column take, the same two-phase O(matches)
    protocol the filtered-projection path uses), so downstream row
    semantics are identical; aggregate sums may differ in the last f32
    bit (the compacted capacity changes the reduction tree shape —
    measured 3.2x e2e at 1% selectivity on a 2^24-row probe).

    Semantics: for INNER/LEFT/CROSS joins a probe-only predicate
    commutes with the join (joined rows inherit their probe columns
    unchanged, so post-join WHERE would keep exactly the rows whose
    probe row passed) — the WHERE is dropped from the rewritten query.
    RIGHT/FULL joins bail out: their build-miss tails must see the
    post-join NaN probe columns (``probe.x IS NULL`` keeps tails).

    Gated to selectivity < 50% (the compaction pays ~one sort + one
    take; near-full tables would pay it for nothing) and single-device
    execution (the mesh route shards the probe differently).  The
    filtered table memoises per probe-table instance, so repeated
    queries reuse it AND the downstream materialized-join memo keyed on
    its identity (CLAUDE.md invariant: the WHERE canonical — string
    codes bound — and the UDF registry version are in the key)."""
    where = query.where
    if where is None or not query.joins:
        return query, table
    from ..config import get_config

    if not get_config().join_filter_pushdown:
        return query, table
    if mesh is not None and getattr(getattr(mesh, "devices", None), "size", 1) > 1:
        return query, table
    if table.num_rows < 4096:
        return query, table
    for j in query.joins:
        if j.kind not in ("inner", "left", "cross"):
            return query, table
        # Self-joins resolve their build side to the probe table (by
        # identity, via the catalog or the _materialize_joins default) —
        # the build side must stay unfiltered, so bail.
        if (catalog or {}).get(j.table, table) is table:
            return query, table
    from ..frontend.ast import Star as _Star

    # CONJUNCT-WISE (r5): each top-level AND conjunct whose columns all
    # resolve to unqualified probe columns pushes down; the residual
    # stays post-join.  (The join output resolves ambiguous unqualified
    # names to the probe side, so probe-resolution here matches
    # post-join evaluation exactly; AND semantics make the split safe —
    # rows the pushed conjuncts drop would be dropped by the full WHERE
    # anyway, with probe columns unchanged through INNER/LEFT/CROSS.)
    # TPC-H q7: the l_shipdate range compacts lineitem before the
    # 5-join chain even though the nation-pair OR cannot push.
    from .executor import _and_chain, _and_conjuncts, bind_strings

    def _probe_only(c) -> bool:
        for n in walk(c):
            if isinstance(n, Variable):
                if n.qualifier is not None or n.name not in table.columns:
                    return False
            if isinstance(n, (Aggregation, _Star)):
                return False
        return True

    push, residual = [], []
    for c in _and_conjuncts(where):
        (push if _probe_only(c) else residual).append(c)
    if not push:
        return query, table

    # Bind string literals against the probe vocabulary up front (every
    # pushed column is a probe column, checked above); the bound codes
    # land in the canonical and hence in every cache/memo key below.
    where = bind_strings(_and_chain(push), table)

    # Columns the rest of the query (and the join conditions) read from
    # the probe side.
    needed: set = set()
    star = False
    nodes = [
        *query.select_list,
        query.having,
        *(t.expr for t in (query.order_by.terms if query.order_by else ())),
        *(query.group_by.keys if query.group_by else ()),
        *(j.condition for j in query.joins if j.condition is not None),
        *residual,  # the unpushed WHERE still reads probe columns
    ]
    for node in nodes:
        if node is None:
            continue
        for n in walk(node):
            if isinstance(n, Variable):
                needed.add(n.name)
                needed.add(n.unqualified)
            elif isinstance(n, _Star):
                star = True
    base_cols = [
        c for c in table.columns if star or c in needed
    ] or list(table.columns)[:1]

    filtered = _filtered_table_for(table, where, base_cols)
    if filtered is None:
        return query, table

    import copy as _copy

    q2 = _copy.copy(query)
    q2.where = _and_chain(residual) if residual else None
    return q2, filtered


def _filtered_table_for(table, where, base_cols):
    """Two-phase compaction of ``table`` to the rows matching ``where``
    (string literals already bound against ``table``): count → stable
    position sort → ONE stacked multi-column take at the counted pow2
    capacity.  Memoised per table instance (CLAUDE.md invariant: the
    bound WHERE canonical, column set, capacity, and UDF registry
    version key the memo).  Returns None when the filter keeps ≥ 50% of
    the rows — the compaction pays ~one sort + one take, which a
    near-full table would pay for nothing."""
    from . import udf as udf_mod
    from .compiler import _as_bool, build_evaluator
    from .executor import _cached_count, _valid_mask
    from ..ops.join import stacked_take

    n_match = _cached_count(
        table,
        ("where_count", where.canonical(), udf_mod.registry_version()),
        lambda: jax.device_get(
            get_or_compile(
                (
                    "prefilter_count",
                    where.canonical(),
                    schema_signature(table.columns),
                    udf_mod.registry_version(),
                ),
                lambda: _build_prefilter_count(where),
            )(table.columns, jnp.int32(table.num_rows))
        ),
    )
    if n_match * 2 > table.num_rows:
        return None

    from collections import OrderedDict

    memo = getattr(table, "_prefilter_memo", None)
    if memo is None:
        memo = table._prefilter_memo = OrderedDict()
    capacity = min(_next_pow2(max(n_match, 16)), table.padded_rows)
    mkey = (
        where.canonical(), tuple(base_cols), capacity,
        udf_mod.registry_version(),
    )
    filtered = memo.get(mkey)
    if filtered is None:
        ckey = (
            "prefilter_compact", where.canonical(), tuple(base_cols),
            capacity, schema_signature(table.columns),
            udf_mod.registry_version(),
        )

        def build():
            cond_fn = build_evaluator(where)

            @jax.jit
            def kernel(cols, num_rows):
                valid = jnp.logical_and(
                    _valid_mask(cols, num_rows), _as_bool(cond_fn(cols))
                )
                n_pad = next(iter(cols.values())).shape[0]
                pos = jnp.arange(n_pad, dtype=jnp.uint32)
                ck = jnp.where(valid, pos, jnp.uint32(0xFFFFFFFF))
                (ck_s,) = lax.sort((ck,), num_keys=1)
                count = jnp.sum(valid.astype(jnp.int32))
                idx = ck_s[:capacity]
                out_valid = jnp.arange(capacity, dtype=jnp.int32) < count
                idx = jnp.where(out_valid, idx, jnp.uint32(0))
                return stacked_take(
                    tuple(cols[c] for c in base_cols), idx, out_valid
                )

            return kernel

        taken = get_or_compile(ckey, build)(
            table.columns, jnp.int32(table.num_rows)
        )
        filtered = DeviceTable(
            dict(zip(base_cols, taken)),
            {c: table.dtypes[c] for c in base_cols if c in table.dtypes},
            n_match,
            capacity,
            # Parent stats stay valid for any row subset (bounds are
            # supersets — every stats gate is monotone-safe).
            stats={c: table.stats[c] for c in base_cols if c in table.stats},
            dicts={c: table.dicts[c] for c in base_cols if c in table.dicts},
        )
        memo[mkey] = filtered
        while len(memo) > 16:
            memo.popitem(last=False)
    return filtered


def _classify_build_conjuncts(
    query: Query, table: DeviceTable, catalog: Optional[dict]
) -> tuple[dict, list, dict]:
    """Split the WHERE conjuncts by the single pushable INNER/CROSS join
    relation each one reads: ``(by_relation, rest, pushable_tables)``.
    Shared by the executor rewrite and EXPLAIN (planning only — no
    device work)."""
    from ..frontend.ast import Star as _Star
    from .executor import _and_conjuncts

    # Relations eligible for filtering: INNER/CROSS build sides resolved
    # through the catalog, large enough that two extra dispatches beat
    # the relay RTT they cost.
    pushable: dict = {}
    kinds = {j.table: j.kind for j in query.joins}
    for j in query.joins:
        t = (catalog or {}).get(j.table)
        if (
            j.kind in ("inner", "cross")
            and t is not None
            and t is not table
            and t.num_rows >= 2
        ):
            # Small dimension tables qualify too (r5): the two extra
            # dispatches a tiny filter costs are memoised per table
            # instance, and shrinking a 25-row nation build side
            # multiplies through every downstream join's row count.
            pushable[j.table] = t

    parts = _and_conjuncts(query.where) if query.where is not None else []
    if not pushable:
        return {}, parts, pushable, {}

    # Unqualified-name ownership across the whole joined namespace: the
    # join output resolves unqualified names probe-first then in join
    # order, so a name is only pushable when exactly one relation owns
    # it anywhere.
    owner: dict = {c: "__probe__" for c in table.columns}
    for j in query.joins:
        t = (catalog or {}).get(j.table, table)
        for c in t.columns:
            owner[c] = j.table if c not in owner else "__ambiguous__"

    probe_names = {query.from_table}
    if getattr(query, "from_source", None) is not None:
        probe_names.add(query.from_source)

    def conjunct_relation(c) -> Optional[str]:
        """The single pushable relation ``c`` reads, or None."""
        rel = None
        for n in walk(c):
            if isinstance(n, (Aggregation, _Star)):
                return None
            if not isinstance(n, Variable):
                continue
            if n.qualifier is not None:
                if n.qualifier in probe_names:
                    return None
                r = n.qualifier if n.qualifier in pushable else None
            else:
                o = owner.get(n.name)
                r = o if o in pushable else None
            if r is None:
                return None
            # The dim-side evaluator resolves the unqualified name.
            if n.unqualified not in pushable[r].columns:
                return None
            if rel is not None and rel != r:
                return None
            rel = r
        return rel

    by_rel: dict = {}
    rest = []
    for c in parts:
        r = conjunct_relation(c)
        if r is not None and kinds.get(r) in ("inner", "cross"):
            by_rel.setdefault(r, []).append(c)
        else:
            rest.append(c)

    # OR-implication (r5): a conjunct that is an OR whose EVERY branch
    # restricts relation R implies the DISJUNCTION of those per-branch
    # restrictions on R — a necessary condition that pre-filters the
    # build side while the original conjunct STAYS in WHERE for the
    # exact combination.  TPC-H q7's
    # (n1=A ∧ n2=B) ∨ (n1=B ∧ n2=A) implies n1 ∈ {A,B} AND n2 ∈ {A,B},
    # shrinking both 25-row nation build sides to 2 before the chain.
    def _or_branches(c) -> list:
        if isinstance(c, BinaryOp) and c.op == "||":
            return _or_branches(c.left) + _or_branches(c.right)
        return [c]

    implied: dict = {}
    for c in rest:
        branches = _or_branches(c)
        if len(branches) < 2:
            continue
        per_branch = [_and_conjuncts(b) for b in branches]
        for r in pushable:
            if kinds.get(r) not in ("inner", "cross"):
                continue
            sels = []
            for bc in per_branch:
                rs = [x for x in bc if conjunct_relation(x) == r]
                if not rs:
                    sels = None
                    break
                sel = rs[0]
                for x in rs[1:]:
                    sel = BinaryOp("&&", sel, x)
                sels.append(sel)
            if sels:
                disj = sels[0]
                for s in sels[1:]:
                    disj = BinaryOp("||", disj, s)
                implied.setdefault(r, []).append(disj)
    return by_rel, rest, pushable, implied


def _pushdown_build_filters(
    query: Query, table: DeviceTable, catalog: Optional[dict], mesh=None
) -> tuple[Query, Optional[dict]]:
    """Build-side predicate pushdown (r3): WHERE conjuncts that
    reference exactly ONE INNER/CROSS-joined relation filter THAT
    relation before the join materialises — the join's build sorts,
    phase-1 match counting, and expansion then see only surviving build
    rows, and removing the conjuncts can unlock the probe-side pushdown
    for the remainder (its all-probe-columns requirement).

    Classic star-schema rewrite (TPC-H q3: the customer-segment and
    order-date filters compact two dimension tables before the fact
    joins them).  Semantics: for INNER/CROSS joins a single-relation
    predicate commutes with the join — post-join WHERE would keep
    exactly the rows whose build row passed (NaN comparisons evaluate
    false on device both pre- and post-join).  LEFT-join build sides
    bail: filtering them would turn matches into NaN-filled misses
    instead of dropping rows.  Conjuncts with ambiguous unqualified
    columns (present in the probe or in two relations) stay in WHERE.
    """
    where = query.where
    if where is None or not query.joins:
        return query, catalog
    from ..config import get_config

    if not get_config().join_filter_pushdown:
        return query, catalog
    if mesh is not None and getattr(getattr(mesh, "devices", None), "size", 1) > 1:
        return query, catalog
    from .executor import bind_strings

    by_rel, rest, pushable, implied = _classify_build_conjuncts(
        query, table, catalog
    )
    if not by_rel and not implied:
        return query, catalog

    catalog2 = dict(catalog or {})
    changed = False
    for rname in {*by_rel, *implied}:
        conjs = by_rel.get(rname, [])
        # Removable single-relation conjuncts AND'd with any implied
        # OR-projections (the latter are redundant with WHERE, so they
        # never leave it — they only pre-shrink the build side).
        cond = None
        for c in [*conjs, *implied.get(rname, [])]:
            cond = c if cond is None else BinaryOp("&&", cond, c)
        dim = pushable[rname]
        bound = bind_strings(cond, dim)
        filtered = _filtered_table_for(dim, bound, list(dim.columns))
        if filtered is None:
            rest.extend(conjs)  # selectivity too high: keep post-join
            continue
        catalog2[rname] = filtered
        changed = True
    if not changed:
        return query, catalog

    import copy as _copy

    q2 = _copy.copy(query)
    w = None
    for c in rest:
        w = c if w is None else BinaryOp("&&", w, c)
    q2.where = w
    return q2, catalog2


def _build_prefilter_count(where):
    from .compiler import _as_bool, build_evaluator
    from .executor import _valid_mask

    cond_fn = build_evaluator(where)

    @jax.jit
    def kernel(cols, num_rows):
        valid = jnp.logical_and(
            _valid_mask(cols, num_rows), _as_bool(cond_fn(cols))
        )
        return jnp.sum(valid.astype(jnp.int32))

    return kernel


def _materialize_joins(
    query: Query, table: DeviceTable, catalog: Optional[dict], mesh=None
) -> DeviceTable:
    """Materialise the query's JOIN chain left-to-right, with projection
    pushdown: only columns referenced outside the joins are gathered.
    A join's OWN condition columns are read directly from its inputs, so
    they only count as "needed" in the output when a LATER join's
    condition (or any non-join clause) references them — for a plain
    ``JOIN dim ON fact.k = dim.k`` the key column never materialises
    into the joined table at all."""
    if not query.joins:
        return table
    catalog = catalog or {}
    base_needed = set()
    for node in [
        *query.select_list, query.where, query.having,
        *(t.expr for t in (query.order_by.terms if query.order_by else ())),
        *(query.group_by.keys if query.group_by else ()),
    ]:
        if node is None:
            continue
        for n in walk(node):
            if isinstance(n, Variable):
                base_needed.add(n.name)
                base_needed.add(n.unqualified)
    current = table
    for i, join in enumerate(query.joins):
        needed = set(base_needed)
        for later in query.joins[i + 1 :]:
            if later.condition is None:  # CROSS JOIN
                continue
            for n in walk(later.condition):
                if isinstance(n, Variable):
                    needed.add(n.name)
                    needed.add(n.unqualified)
        right = catalog.get(join.table, table)
        current = _materialize_join(
            current, right, join.table, join.condition, needed=needed,
            mesh=mesh, kind=getattr(join, "kind", "inner"),
        )
    return current
