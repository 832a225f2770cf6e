"""Plan executor: lowers parsed queries onto the physical operators.

This is the TPU-native replacement for the coherent halves of
``WarpDB::query`` / ``WarpDB::query_sql`` (warpdb.cpp:199-256, 297-498).
Each query shape compiles (once, via the plan-keyed kernel cache) into
one or two fused XLA programs:

* scalar path (``run_expression``): fused filter+projection over padded
  columns — returns a length-N float32 vector like the reference's
  ``query`` (filtered-out slots are a defined 0.0, not garbage);
* relational path (``run_query``): WHERE → (JOIN …) → GROUP BY/HAVING
  or projection → DISTINCT → ORDER BY → OFFSET/LIMIT, with all O(N)
  work on device and only the ≤G-sized aggregate table pulled to host.

Dynamic cardinalities (filter/group/join outputs) use the two-phase
static-shape protocol: a counting kernel picks a power-of-two capacity
bucket, so each query shape compiles at most O(log N) times ever.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import ExecutionError, UnsupportedError, ValidationError
from ..frontend.ast import (
    Aggregation,
    AggregationType,
    Alias,
    BinaryOp,
    CaseWhen,
    Constant,
    FunctionCall,
    GroupBy,
    InCodeSet,
    LikePattern,
    Node,
    OrderBy,
    Query,
    Star,
    StringLiteral,
    Variable,
    WindowFunction,
    unalias,
    walk,
)
from ..ops.aggregate import (
    count_distinct,
    dense_group_aggregate,
    is_integral,
    midrange_group_aggregate,
    window_aggregate,
)
from ..ops.join import (
    join_gather_indices,
    join_match_counts,
    join_match_counts_dense,
)
from ..ops.sort import sort_pairs, sort_values, top_k_values
from ..storage.table import DeviceTable
from . import udf as udf_mod
from .compiler import (
    _as_bool,
    _as_f32,
    build_evaluator,
    get_or_compile,
    schema_signature,
)

__all__ = ["run_expression", "run_query", "run_query_table"]


def _next_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def _cached_count(table, key, compute) -> int:
    """Memoise a counted cardinality per immutable table instance.

    Device tables never mutate, so a count that depends only on the
    table and a canonical plan fragment (match counts, distinct counts,
    group counts) is deterministic — repeated queries skip the counting
    dispatch AND the blocking host sync between the two-phase protocol's
    phases (each sync costs a full relay round-trip)."""
    memo = getattr(table, "_count_memo", None)
    if memo is None:
        memo = table._count_memo = {}
    if key not in memo:
        memo[key] = int(compute())
    return memo[key]


def _valid_mask(cols: dict, num_rows) -> jax.Array:
    n_pad = next(iter(cols.values())).shape[0]
    return jnp.arange(n_pad, dtype=jnp.int32) < num_rows


def _broadcast(x: jax.Array, cols: dict) -> jax.Array:
    n_pad = next(iter(cols.values())).shape[0]
    return jnp.broadcast_to(x, (n_pad,))


# ---------------------------------------------------------------------------
# String-literal binding (dictionary codes)
# ---------------------------------------------------------------------------

_CMP_OPS = (">", "<", ">=", "<=", "==", "=", "!=")


def _vocab_of(node: Node, table: DeviceTable):
    if isinstance(node, Variable):
        v = table.dicts.get(node.name)
        if v is None:
            v = table.dicts.get(node.unqualified)
        return v
    return None


def bind_strings(node: Optional[Node], table: DeviceTable) -> Optional[Node]:
    """Rewrite string literals into dictionary-code constants against
    ``table``'s vocabularies.  A literal is only meaningful when compared
    to a string column; the sorted vocabulary makes every comparison
    operator order-correct (see storage/strings.py)."""
    if node is None:
        return None
    if isinstance(node, StringLiteral):
        raise ValidationError(
            f"String literal {node.canonical()} can only be used in a "
            "comparison with a string column"
        )
    if isinstance(node, Alias):
        return Alias(bind_strings(node.expr, table), node.name)
    if isinstance(node, BinaryOp):
        l, r = node.left, node.right
        lit = None
        if isinstance(l, StringLiteral) or isinstance(r, StringLiteral):
            from ..storage.strings import literal_code

            if node.op not in _CMP_OPS:
                raise ValidationError(
                    "String literals only support comparison operators; "
                    f"got '{node.op}'"
                )
            lit, other = (l, r) if isinstance(l, StringLiteral) else (r, l)
            vocab = _vocab_of(other, table)
            if vocab is None:
                raise ValidationError(
                    f"String literal {lit.canonical()} compared to "
                    "a non-string expression"
                )
            const = Constant(repr(literal_code(vocab, lit.text)))
            new_l = const if l is lit else bind_strings(l, table)
            new_r = const if r is lit else bind_strings(r, table)
            return BinaryOp(node.op, new_l, new_r)
        if node.op in _CMP_OPS:
            lv, rv = _vocab_of(l, table), _vocab_of(r, table)
            if lv is not None and rv is not None and lv is not rv:
                # Same-table string columns share one vocabulary (codes
                # comparable by construction); across tables the codes
                # are unrelated — only JOIN conditions translate them.
                if len(lv) != len(rv) or not np.array_equal(lv, rv):
                    raise ValidationError(
                        "Comparing string columns with different "
                        "dictionaries is only supported as a JOIN "
                        "condition"
                    )
            elif (lv is None) != (rv is None) and isinstance(
                l, Variable
            ) and isinstance(r, Variable):
                raise ValidationError(
                    "Comparing a string column with a numeric column"
                )
        return BinaryOp(node.op, bind_strings(l, table), bind_strings(r, table))
    if isinstance(node, LikePattern):
        import re

        vocab = _vocab_of(node.expr, table)
        if vocab is None:
            raise ValidationError(
                "LIKE requires a string column on its left side"
            )
        # SQL LIKE wildcards: % = any sequence, _ = one character.
        # Everything else is literal — escape it so regex/glob
        # metacharacters ([, ], *, ?, .) in patterns or data match
        # literally.
        rx = re.compile(
            "".join(
                ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
                for ch in node.pattern
            )
        )
        codes = tuple(
            int(i) for i, s in enumerate(vocab) if rx.fullmatch(str(s))
        )
        return InCodeSet(node.expr, codes, len(vocab))
    if isinstance(node, CaseWhen):
        return CaseWhen(
            tuple(bind_strings(c, table) for c in node.conditions),
            tuple(bind_strings(v, table) for v in node.values),
            bind_strings(node.default, table),
        )
    if isinstance(node, FunctionCall):
        return FunctionCall(
            node.name, tuple(bind_strings(a, table) for a in node.args)
        )
    if isinstance(node, Aggregation):
        return Aggregation(node.agg, bind_strings(node.expr, table), node.param)
    if isinstance(node, WindowFunction):
        return WindowFunction(
            node.agg,
            bind_strings(node.expr, table),
            tuple(bind_strings(p, table) for p in node.partition_by),
            None
            if node.order_by is None
            else OrderBy(
                bind_strings(node.order_by.expr, table),
                node.order_by.ascending,
            ),
        )
    return node


def _bind_query_strings(query: Query, table: DeviceTable) -> Query:
    """Bind string literals in every clause (joins are bound separately in
    ``_materialize_join``, where both tables are known)."""
    if not table.dicts and not any(
        isinstance(n, (StringLiteral, LikePattern)) for item in [
            *query.select_list, query.where, query.having,
            *(t.expr for t in (query.order_by.terms if query.order_by else ())),
            *(query.group_by.keys if query.group_by else ()),
        ] if item is not None for n in walk(item)
    ):
        return query
    import copy as _copy

    q = _copy.copy(query)
    q.select_list = [bind_strings(s, table) for s in query.select_list]
    q.where = bind_strings(query.where, table)
    q.having = bind_strings(query.having, table)
    if query.order_by is not None:
        q.order_by = OrderBy(
            bind_strings(query.order_by.expr, table),
            query.order_by.ascending,
            tuple(
                OrderBy(bind_strings(t.expr, table), t.ascending)
                for t in query.order_by.then
            ),
        )
    if query.group_by is not None:
        q.group_by = GroupBy(
            tuple(bind_strings(k, table) for k in query.group_by.keys)
        )
    return q


# ---------------------------------------------------------------------------
# Scalar expression path (WarpDB::query semantics)
# ---------------------------------------------------------------------------


def run_expression(
    table: DeviceTable, expr: Node, cond: Optional[Node]
) -> np.ndarray:
    """Fused filter+project; returns exactly ``num_rows`` float32 values
    (filtered-out rows = 0.0, documented deviation from the reference's
    uninitialized slots, jit.cpp:56-58).

    Stats-driven pruning (the reference optimizer's intended behavior,
    optimizer.cpp:38-47): a provably-false filter skips the device
    launch entirely; a provably-true one is dropped from the kernel."""
    from .compiler import compile_filter_project
    from .optimizer import analyze_condition, fold_constants

    expr = fold_constants(bind_strings(expr, table))
    if cond is not None:
        cond = bind_strings(cond, table)
    if cond is not None:
        cond = fold_constants(cond)
        verdict = analyze_condition(cond, table.stats)
        if verdict is False:
            return np.zeros(table.num_rows, dtype=np.float32)
        if verdict is True:
            cond = None

    kernel = compile_filter_project(expr, cond, table.columns)
    out = kernel(table.columns, jnp.int32(table.num_rows))
    return np.asarray(out)[: table.num_rows]


# ---------------------------------------------------------------------------
# Aggregation helpers
# ---------------------------------------------------------------------------


class _AggSpec:
    """One (agg type, value-expression[, parameter]) triple needed by a
    query."""

    def __init__(self, agg: AggregationType, expr: Node, param=None):
        self.agg = agg
        self.expr = expr
        self.param = param
        self.key = (agg.value, expr.canonical(), param)


def _collect_agg_specs(nodes: Sequence[Node]) -> list[_AggSpec]:
    specs: dict = {}
    for node in nodes:
        if node is None:
            continue
        for n in walk(node):
            if isinstance(n, Aggregation):
                spec = _AggSpec(n.agg, n.expr, getattr(n, "param", None))
                specs.setdefault(spec.key, spec)
    return list(specs.values())


def _group_level_eval(
    node: Node,
    key_canon: dict,
    agg_values: dict,
) -> np.ndarray:
    """NumPy evaluator over the (small) per-group aggregate table.
    Used for select items, HAVING and group-level ORDER BY — the repaired
    intent of the reference's host ``eval_having_node`` (warpdb.cpp:387-427),
    except each aggregate evaluates over its *own* expression."""
    if isinstance(node, Alias):
        return _group_level_eval(node.expr, key_canon, agg_values)
    if isinstance(node, Aggregation):
        return agg_values[
            (node.agg.value, node.expr.canonical(),
             getattr(node, "param", None))
        ]
    if isinstance(node, Constant):
        return np.float32(node.value)
    if isinstance(node, BinaryOp):
        l = _group_level_eval(node.left, key_canon, agg_values)
        r = _group_level_eval(node.right, key_canon, agg_values)
        op = node.op
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "&&":
            return np.logical_and(l != 0, r != 0)
        if op == "||":
            return np.logical_or(l != 0, r != 0)
        cmp = {
            ">": np.greater, "<": np.less, ">=": np.greater_equal,
            "<=": np.less_equal, "==": np.equal, "=": np.equal,
            "!=": np.not_equal,
        }[op]
        return cmp(l, r)
    canon = node.canonical()
    if canon in key_canon:
        return key_canon[canon]
    if isinstance(node, CaseWhen):
        out = (
            np.asarray(
                _group_level_eval(node.default, key_canon, agg_values),
                np.float32,
            )
            if node.default is not None
            else np.float32(0.0)
        )
        for c, v in zip(reversed(node.conditions), reversed(node.values)):
            m = np.asarray(_group_level_eval(c, key_canon, agg_values))
            m = m if m.dtype == bool else m != 0
            out = np.where(
                m,
                np.asarray(
                    _group_level_eval(v, key_canon, agg_values), np.float32
                ),
                out,
            )
        return out
    if isinstance(node, FunctionCall):
        args = [
            np.asarray(_group_level_eval(a, key_canon, agg_values), np.float32)
            for a in node.args
        ]
        return np.asarray(udf_mod.resolve_udf(node.name)(*args), np.float32)
    raise UnsupportedError(
        "Grouped SELECT/HAVING/ORDER BY expressions must reference the "
        f"GROUP BY key or aggregates; got: {canon}"
    )


def _agg_value_from_result(spec: _AggSpec, counts, value_aggs) -> np.ndarray:
    counts_f = counts.astype(np.float32)
    if spec.agg is AggregationType.COUNT:
        return counts_f  # no value column needed
    sums, mins, maxs = value_aggs
    if spec.agg is AggregationType.SUM:
        return sums
    if spec.agg is AggregationType.AVG:
        return sums / np.maximum(counts_f, 1.0)
    if spec.agg is AggregationType.MIN:
        return mins
    if spec.agg is AggregationType.MAX:
        return maxs
    raise ExecutionError(f"Unknown aggregation {spec.agg}")


# ---------------------------------------------------------------------------
# JOIN execution lives in engine/join_exec.py (same subsystem, split for
# reviewability); names re-exported here for back-compat.
# ---------------------------------------------------------------------------

from .join_exec import (  # noqa: E402
    _equality_pairs,
    _left_fill_stats,
    _materialize_join,
    _materialize_join_distributed,
    _materialize_join_local,
    _materialize_joins,
    _resolve_column,
    _resolve_join_sides,
    _table_uid,
    _translated_right_key,
    _try_eager_join_aggregate,
)


# ---------------------------------------------------------------------------
# The relational pipeline (query_sql semantics)
# ---------------------------------------------------------------------------


def _expand_stars(select_list, table: DeviceTable) -> list:
    """Expand bare ``*`` select items to every (unqualified-addressable)
    column of ``table``.  Returns the original list object when no
    expansion is needed."""
    if not any(isinstance(unalias(s), Star) for s in select_list):
        return select_list
    out: list = []
    for s in select_list:
        if isinstance(unalias(s), Star):
            out.extend(Variable(n) for n in table.dtypes if "." not in n)
        else:
            out.append(s)
    return out


def expand_stars_query(query: Query, table: DeviceTable, catalog=None) -> list:
    """Catalog-aware ``SELECT *`` expansion: covers joined tables without
    materialising the join (right-side columns appear unqualified when
    free, else qualified — mirroring the joined-table namespace)."""
    if not any(isinstance(unalias(s), Star) for s in query.select_list):
        return query.select_list
    if not query.joins:
        return _expand_stars(query.select_list, table)
    catalog = catalog or {}
    names = [n for n in table.dtypes if "." not in n]
    seen = set(names)
    for join in query.joins:
        right = catalog.get(join.table, table)
        for n in right.dtypes:
            if "." in n:
                continue
            if n in seen:
                names.append(f"{join.table}.{n}")
            else:
                names.append(n)
                seen.add(n)
    out: list = []
    for s in query.select_list:
        if isinstance(unalias(s), Star):
            out.extend(Variable(n) for n in names)
        else:
            out.append(s)
    return out




def run_query(
    query: Query,
    table: DeviceTable,
    catalog: Optional[dict] = None,
    mesh=None,
) -> np.ndarray:
    """Execute a parsed SELECT against ``table`` (the FROM relation).

    JOIN table names resolve through ``catalog``; unknown names fall back
    to ``table`` itself — mirroring the reference's "loads the same table
    for demonstration" (warpdb.hpp:22-23), except the join actually runs.

    With ``mesh`` (>1 device), GROUP BY runs distributed: per-shard
    partial aggregation merged over ``all_gather`` for small key counts,
    or the hash-partitioned all-to-all shuffle for large ones.
    """
    from .optimizer import analyze_condition, fold_constants

    import copy as _copy

    if any(isinstance(s, Alias) for s in query.select_list):
        query = _copy.copy(query)
        query.select_list = [unalias(s) for s in query.select_list]

    catalog = catalog or {}
    expanded = expand_stars_query(query, table, catalog)
    if expanded is not query.select_list:
        query = _copy.copy(query)
        query.select_list = expanded

    if query.joins and query.group_by is not None:
        rewritten = _try_eager_join_aggregate(query, table, catalog, mesh)
        if rewritten is not None:
            query, catalog = rewritten

    current = _materialize_joins(query, table, catalog, mesh=mesh)

    query = _bind_query_strings(query, current)

    if not query.select_list:
        raise ExecutionError("Empty SELECT list")

    if query.where is not None:
        query_where = fold_constants(query.where)
        verdict = analyze_condition(query_where, current.stats)
        is_global_agg = query.group_by is None and isinstance(
            query.select_list[0], Aggregation
        )
        if verdict is False and not is_global_agg:
            return np.zeros(0, dtype=np.float32)  # filter eliminates all rows
        import copy as _copy

        query = _copy.copy(query)
        query.where = None if verdict is True else query_where

    if query.group_by is not None:
        values = _run_grouped(query, current, mesh=mesh)
    else:
        values = _run_projection(query, current, mesh=mesh)

    # OFFSET then LIMIT, host-side (reference warpdb.cpp:485-495).
    if query.offset is not None:
        values = values[query.offset :] if query.offset < len(values) else values[:0]
    if query.limit is not None and query.limit < len(values):
        values = values[: query.limit]
    return values


def _run_grouped(query: Query, table: DeviceTable, mesh=None) -> np.ndarray:
    """First select item of the grouped pipeline (reference query_sql
    returns only the first expression's values, warpdb.cpp:349-371)."""
    return _run_grouped_multi(
        query, table, [unalias(query.select_list[0])], mesh=mesh
    )[0]


def _grouped_plan(query: Query, select_items: list) -> dict:
    """Static planning for a grouped query: aggregate specs, deduped value
    expressions, and required reductions."""
    group_keys = list(query.group_by.keys)
    order_terms = query.order_by.terms if query.order_by else ()
    specs = _collect_agg_specs(
        [*select_items, query.having, *(t.expr for t in order_terms)]
    )
    # Map each non-COUNT spec to a value column (dedup by expression
    # canonical); COUNT reads the always-produced per-group counts.
    vexpr_canons: list[str] = []
    vexpr_nodes: list[Node] = []
    spec_to_vidx: dict = {}
    cd_specs: list[_AggSpec] = []
    for spec in specs:
        if spec.agg is AggregationType.COUNT:
            spec_to_vidx[spec.key] = None
            continue
        if spec.agg is AggregationType.COUNT_DISTINCT:
            spec_to_vidx[spec.key] = "cd"
            cd_specs.append(spec)
            continue
        if spec.agg in (AggregationType.MEDIAN, AggregationType.PERCENTILE):
            spec_to_vidx[spec.key] = "cd"
            cd_specs.append(spec)
            continue
        c = spec.expr.canonical()
        if c not in vexpr_canons:
            vexpr_canons.append(c)
            vexpr_nodes.append(spec.expr)
        spec_to_vidx[spec.key] = vexpr_canons.index(c)
    if not vexpr_nodes:
        # Keys/counts-only query; distributed + dense kernels expect at
        # least one value column.
        vexpr_canons = ["1.0f"]
        vexpr_nodes = [Constant("1")]

    # Which reductions the query actually needs (SUM-only queries skip
    # the min/max passes in the dense kernel).
    need = set()
    for spec in specs:
        if spec.agg in (AggregationType.SUM, AggregationType.AVG):
            need.add("sum")
        elif spec.agg is AggregationType.MIN:
            need.add("min")
        elif spec.agg is AggregationType.MAX:
            need.add("max")
    return {
        "group_keys": group_keys,
        "keys_canon": tuple(k.canonical() for k in group_keys),
        "specs": specs,
        "spec_to_vidx": spec_to_vidx,
        "vexpr_nodes": vexpr_nodes,
        "vexpr_canons": vexpr_canons,
        "cd_specs": cd_specs,
        "need": tuple(sorted(need)),
    }


def _grouped_partials(
    query: Query, table: DeviceTable, plan: dict, mesh=None
) -> "_HostGroupResult":
    """Compute the per-group aggregate table (keys, counts, sum/min/max
    per value expression) on device — the mergeable partial form shared
    by the single-table, distributed, and out-of-core streaming paths."""
    group_keys = plan["group_keys"]
    vexpr_nodes = plan["vexpr_nodes"]
    vexpr_canons = plan["vexpr_canons"]
    where_canon = query.where.canonical() if query.where is not None else ""

    result = None
    if mesh is not None and mesh.devices.size > 1:
        result = _distributed_group(query, table, group_keys, vexpr_nodes,
                                    mesh)
    if result is None:
        # TPU fast path: dense integer-key aggregation (no sort, no
        # scatter) when stats bound a single key to a small integral range.
        # LIMIT pushdown is legal when groups emerge in the default
        # ascending-key order and nothing downstream re-filters/re-orders.
        limit_cap = None
        if (
            query.limit is not None
            and query.having is None
            and query.order_by is None
            and not query.distinct
            and not plan["cd_specs"]
        ):
            limit_cap = query.limit + (query.offset or 0)
        result = _try_dense_group(query, table, group_keys, vexpr_nodes,
                                  vexpr_canons, where_canon, plan["need"],
                                  limit_cap=limit_cap)
    if result is None:
        result = _sorted_group(query, table, group_keys, vexpr_nodes,
                               vexpr_canons, where_canon, plan["keys_canon"],
                               plan["need"])
    for spec in plan["cd_specs"]:
        result.dcounts[spec.key] = _grouped_value_order_stat(
            query, table, group_keys, spec.expr, result.num_groups,
            plan["keys_canon"], where_canon, spec.agg,
            raw_int_key=getattr(result, "raw_int_key", False),
            param=spec.param,
        )
    return result


def _run_grouped_multi(
    query: Query, table: DeviceTable, select_items: list, mesh=None
) -> list[np.ndarray]:
    """Grouped pipeline for any number of select items.  Each item may be
    an aggregate, the group key itself, or any arithmetic over them
    (``SELECT quantity, SUM(price), SUM(price)/COUNT(*) …``) — exceeds the
    reference, which required a lone aggregate (warpdb.cpp:350-353)."""
    plan = _grouped_plan(query, select_items)
    result = _grouped_partials(query, table, plan, mesh=mesh)
    return _finish_grouped(query, select_items, plan["specs"],
                           plan["spec_to_vidx"], result, plan["keys_canon"])


def _distributed_group(query, table, group_keys, vexpr_nodes, mesh):
    """Mesh-distributed GROUP BY (single or composite keys).  Picks the
    all_gather partial-merge for small stats-bounded key-space products
    and the all-to-all hash shuffle otherwise — composite keys hash and
    exchange as tuples (VERDICT r1 item 7)."""
    from ..parallel.shuffle import shuffle_grouped
    from ..parallel.sharded import run_grouped_sharded
    from .optimizer import expr_range

    from ..config import get_config

    # Key-space bound: product of per-key ranges (None = unbounded).
    space = 1
    for k in group_keys:
        rng = expr_range(k, table.stats)
        if rng is None or not (
            np.isfinite(rng[0]) and np.isfinite(rng[1])
        ):
            space = None
            break
        space *= max(int(rng[1] - rng[0] + 1), 1)
        if space > get_config().distributed_small_keys:
            break
    small = space is not None and space <= get_config().distributed_small_keys

    if small:
        capacity = _next_pow2(max(space, 16))
        out_keys, out_counts, out_vals, num_groups = run_grouped_sharded(
            list(group_keys), vexpr_nodes, query.where, table, capacity,
            mesh=mesh,
        )
        host = jax.device_get((out_keys, out_counts, out_vals, num_groups))
        out_keys, out_counts, out_vals, num_groups = host
        ng = int(num_groups)
        return _HostGroupResult(
            tuple(k[:ng] for k in out_keys),
            out_counts[:ng],
            tuple((v[0][:ng], v[1][:ng], v[2][:ng]) for v in out_vals),
            ng,
        )

    # Skew-proof map-side combine first: a hot key sends at most one
    # partial per shard, so data skew cannot overflow an exchange bucket.
    from ..parallel.shuffle import combine_shuffle_grouped

    res = combine_shuffle_grouped(
        list(group_keys), vexpr_nodes, query.where, table, mesh=mesh
    )
    if res is None:
        # Per-shard distinct keys exceeded the combine capacity (very
        # high cardinality): exchange raw rows instead.
        res = shuffle_grouped(
            list(group_keys), vexpr_nodes, query.where, table, mesh=mesh
        )
    return _HostGroupResult(
        tuple(res.keys),
        res.counts,
        tuple(
            (res.sums[i], res.mins[i], res.maxs[i])
            for i in range(len(vexpr_nodes))
        ),
        res.num_groups,
    )


def _integral_key_check(table, key_expr) -> tuple:
    """``(integral_static, ok)`` for a dense/midrange-path key:
    integrality is guaranteed for int/string-code columns and
    runtime-checked (memoised per immutable table instance) for float
    expressions."""
    key_dtype = None
    if isinstance(key_expr, Variable):
        key_dtype = table.dtypes.get(key_expr.name) or table.dtypes.get(
            key_expr.unqualified
        )
    integral_static = key_dtype is not None and key_dtype.value in (
        "int32",
        "int64",
        "string",  # dictionary codes are int32 by construction
    )
    if integral_static:
        return True, True
    cols = table.columns
    key_canon = key_expr.canonical()
    memo = getattr(table, "_integral_memo", None)
    if memo is None:
        memo = table._integral_memo = {}
    if key_canon not in memo:
        ikey = ("group_integral", key_canon, schema_signature(cols),
                udf_mod.registry_version())

        def build_intcheck():
            key_fn = build_evaluator(key_expr)

            @jax.jit
            def kernel(cols, num_rows):
                valid = _valid_mask(cols, num_rows)
                k = _broadcast(_as_f32(key_fn(cols)), cols)
                return is_integral(k, valid)

            return kernel

        memo[key_canon] = bool(
            get_or_compile(ikey, build_intcheck)(
                cols, jnp.int32(table.num_rows)
            )
        )
    return False, memo[key_canon]


def _try_dense_group(query, table, group_keys, vexpr_nodes, vexpr_canons,
                     where_canon, need=("sum", "min", "max"),
                     limit_cap=None):
    """Attempt the sort-free GROUP BY ladder — dense O(N·G) VPU sweep for
    small key ranges, scatter/MXU slot tables for mid-range ones; returns
    None when stats can't prove an integral key range narrow enough
    (falls back to the sort path)."""
    from ..config import get_config
    from .optimizer import expr_range

    if len(group_keys) != 1:
        return None
    key_expr = group_keys[0]
    rng = expr_range(key_expr, table.stats)
    if rng is None:
        return None
    lo, hi = rng
    cfg = get_config()
    if not (np.isfinite(lo) and np.isfinite(hi)):
        return None
    if hi - lo + 1 > cfg.midrange_group_max_slots:
        return None
    base = int(np.floor(lo))
    num_slots = int(np.floor(hi)) - base + 1
    if num_slots < 1:
        return None
    if not (-(2**31) <= base and base + num_slots <= 2**31 - 1):
        # Key values outside int32: the dense gid arithmetic would
        # overflow at trace time; the sort path handles these fine.
        return None

    cols = table.columns
    n_rows = jnp.int32(table.num_rows)
    key_canon = key_expr.canonical()

    integral_static, ok = _integral_key_check(table, key_expr)
    if not ok:
        return None

    if num_slots > cfg.dense_group_max_slots:
        return _midrange_group_run(
            query, table, key_expr, vexpr_nodes, vexpr_canons, where_canon,
            base, num_slots, need, integral_static, limit_cap,
        )

    gkey = ("dense_group", key_canon, tuple(vexpr_canons), where_canon,
            schema_signature(cols), base, num_slots, need,
            udf_mod.registry_version())

    def build_dense():
        key_fn = _raw_or_f32_key_fn(key_expr, integral_static)
        val_fns = [build_evaluator(v) for v in vexpr_nodes]
        cond_fn = build_evaluator(query.where) if query.where is not None else None

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            keys = _broadcast(key_fn(cols), cols)
            vals = tuple(_broadcast(_as_f32(f(cols)), cols) for f in val_fns)
            return dense_group_aggregate(
                keys, vals, valid, base, num_slots, need
            )

        return kernel

    result = jax.device_get(get_or_compile(gkey, build_dense)(cols, n_rows))
    # Dense slots include empty groups; compact to occupied slots so the
    # output contract matches the sort path.
    counts = result.counts
    occ = counts > 0
    keys = tuple(k[occ] for k in result.keys)
    values = tuple(
        (v.sums[occ], v.mins[occ], v.maxs[occ]) for v in result.values
    )
    out = _HostGroupResult(keys, counts[occ], values, int(occ.sum()))
    # COUNT(DISTINCT) kernels must group keys exactly the way this path
    # did: raw ints when the dense kernel read the raw column.
    out.raw_int_key = bool(
        isinstance(key_expr, Variable) and integral_static
    )
    return out


def _raw_or_f32_key_fn(key_expr, integral_static: bool):
    """Key evaluator for the dense/midrange paths: bare integer/string
    columns feed kernels as raw ints (f32 would corrupt ids beyond 2^24);
    everything else evaluates to f32."""
    if isinstance(key_expr, Variable) and integral_static:
        kname, kuname = key_expr.name, key_expr.unqualified

        def key_fn(cols):
            arr = cols.get(kname)
            if arr is None:
                arr = cols.get(kuname)
            return arr

        return key_fn
    inner = build_evaluator(key_expr)
    return lambda cols: _as_f32(inner(cols))


def _midrange_group_run(query, table, key_expr, vexpr_nodes, vexpr_canons,
                        where_canon, base, num_slots, need, integral_static,
                        limit_cap=None):
    """Mid-range sort-free GROUP BY: scatter/MXU into a dense slot table
    (ops/aggregate.midrange_group_aggregate), then a device-side
    occupancy compaction so the relay transfer is O(groups) — at 2^16+
    slots, shipping the raw slot table through the ~10 MB/s relay would
    cost more than the aggregation itself.

    Two-phase: phase A aggregates and ships only the ``num_groups``
    scalar; phase B sorts occupied slots to the front (a tiny
    capacity-sized sort) and ships a power-of-two compacted table.
    ``limit_cap`` (LIMIT pushdown — legal when there is no HAVING /
    ORDER BY / DISTINCT / COUNT-DISTINCT, since groups emerge in the
    default ascending-key order) truncates phase B to the first
    ``limit_cap`` groups, making ``GROUP BY k LIMIT 5`` ship 5 rows
    instead of 2^16."""
    from ..config import get_config

    from .optimizer import expr_range

    cols = table.columns
    n_rows = jnp.int32(table.num_rows)
    key_canon = key_expr.canonical()
    # The MXU engine scales one-hot columns by the value, so a ±inf/NaN
    # value would poison OTHER slots through 0·inf = NaN — it only runs
    # when stats PROVE every summed expression finite (same gate as the
    # value-space top-k); the scatter engine folds non-finite values
    # exactly.
    import math

    def _finite_range(e):
        r = expr_range(e, table.stats)
        return (
            r is not None and math.isfinite(r[0]) and math.isfinite(r[1])
        )

    values_finite = all(_finite_range(v) for v in vexpr_nodes)
    use_mxu = (
        set(need) <= {"sum"}
        and num_slots <= get_config().mxu_group_max_slots
        and ("sum" not in need or values_finite)
    )

    # With LIMIT pushdown the output capacity is static, so aggregation
    # and occupancy compaction fuse into ONE dispatch — no intermediate
    # num_groups round-trip through the relay.  Without a limit the
    # two-phase protocol sizes the compacted transfer from the scalar.
    fused_cap = (
        min(_next_pow2(max(min(limit_cap, num_slots), 16)), num_slots)
        if limit_cap is not None
        else 0
    )

    def _compact(res, out_cap):
        counts = res.counts
        slots = jnp.arange(num_slots, dtype=jnp.int32)
        okey = jnp.where(counts > 0, slots, jnp.int32(0x7FFFFFFF))
        ops = (okey, res.keys[0], counts) + tuple(
            x for v in res.values for x in (v.sums, v.mins, v.maxs)
        )
        sorted_ops = lax.sort(ops, num_keys=1, is_stable=False)
        return tuple(o[:out_cap] for o in sorted_ops[1:])

    gkey = ("midrange_group", key_canon, tuple(vexpr_canons), where_canon,
            schema_signature(cols), base, num_slots, need, use_mxu,
            fused_cap, udf_mod.registry_version())

    def build():
        key_fn = _raw_or_f32_key_fn(key_expr, integral_static)
        val_fns = [build_evaluator(v) for v in vexpr_nodes]
        cond_fn = (
            build_evaluator(query.where) if query.where is not None else None
        )

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            keys = _broadcast(key_fn(cols), cols)
            vals = tuple(_broadcast(_as_f32(f(cols)), cols) for f in val_fns)
            res = midrange_group_aggregate(
                keys, vals, valid, base, num_slots, need, use_mxu
            )
            if fused_cap:
                return _compact(res, fused_cap) + (res.num_groups,)
            return res

        return kernel

    if fused_cap:
        out = jax.device_get(get_or_compile(gkey, build)(cols, n_rows))
        ng = int(out[-1])
        out = out[:-1]
        ng_eff = min(ng, limit_cap)
    else:
        res = get_or_compile(gkey, build)(cols, n_rows)
        ng = _cached_count(
            table,
            ("midrange_ng", key_canon, where_canon, base, num_slots,
             udf_mod.registry_version()),
            lambda: jax.device_get(res.num_groups),
        )
        ng_eff = ng
        out_cap = min(_next_pow2(max(ng_eff, 16)), num_slots)

        ckey = ("midrange_compact", num_slots, out_cap, len(vexpr_canons),
                need)

        def build_compact():
            @jax.jit
            def kernel(res):
                return _compact(res, out_cap)

            return kernel

        out = jax.device_get(get_or_compile(ckey, build_compact)(res))
    keys_c, counts_c = out[0], out[1]
    vals_flat = out[2:]
    values = tuple(
        (
            vals_flat[3 * i][:ng_eff],
            vals_flat[3 * i + 1][:ng_eff],
            vals_flat[3 * i + 2][:ng_eff],
        )
        for i in range(len(vexpr_nodes))
    )
    result = _HostGroupResult(
        (keys_c[:ng_eff],), counts_c[:ng_eff], values, ng_eff
    )
    result.raw_int_key = bool(
        isinstance(key_expr, Variable) and integral_static
    )
    return result


class _HostGroupResult:
    """GroupResult already pulled to host and compacted."""

    def __init__(self, keys, counts, values, num_groups, dcounts=None):
        self.keys = keys
        self.counts = counts
        self.values = values
        self.num_groups = num_groups
        # COUNT(DISTINCT e) per-group counts, keyed by spec key.
        self.dcounts: dict = dcounts or {}
        # Whether the producing path grouped on raw integer keys (dense
        # fast path) — COUNT(DISTINCT) kernels must match it exactly.
        self.raw_int_key: bool = False


def _grouped_value_order_stat(query, table, group_keys, expr, num_groups,
                              keys_canon, where_canon, agg,
                              raw_int_key: bool = False,
                              param=None) -> np.ndarray:
    """Per-group statistics needing values SORTED WITHIN each group —
    COUNT(DISTINCT expr) and MEDIAN(expr) — from one sort by
    (group keys…, value).  Distinct counts scatter-add value-boundary
    flags per key segment; medians gather the middle element(s) of each
    segment.  Segments emerge in the same ascending key order as every
    other grouped path, so the output aligns with the main aggregate
    table row-for-row."""
    from ..ops.sort import float_sort_key

    cols = table.columns
    n_rows = jnp.int32(table.num_rows)
    capacity = _next_pow2(max(int(num_groups), 16))

    key = ("group_order_stat", agg.value, param, keys_canon,
           expr.canonical(), where_canon, schema_signature(cols), capacity,
           raw_int_key, udf_mod.registry_version())

    def build():
        from ..ops.sort import int_sort_key

        if raw_int_key:
            # Mirror the dense path: group on the raw integer column so
            # ids beyond f32's 2^24 integer range stay distinct.
            kvar = group_keys[0]
            kname, kuname = kvar.name, kvar.unqualified

            def raw_key(cols):
                arr = cols.get(kname)
                if arr is None:
                    arr = cols.get(kuname)
                return arr

            key_fns = [raw_key]
        else:
            key_fns = [build_evaluator(k) for k in group_keys]
        val_fn = build_evaluator(expr)
        cond_fn = build_evaluator(query.where) if query.where is not None else None
        u32_max = jnp.uint32(0xFFFFFFFF)

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            if raw_int_key:
                keys = tuple(_broadcast(f(cols), cols) for f in key_fns)
                skeys = tuple(
                    jnp.where(valid, int_sort_key(k), u32_max) for k in keys
                )
            else:
                keys = tuple(
                    _broadcast(_as_f32(f(cols)), cols) for f in key_fns
                )
                skeys = tuple(
                    jnp.where(valid, float_sort_key(k), u32_max)
                    for k in keys
                )
            vals = _broadcast(_as_f32(val_fn(cols)), cols)
            sval = float_sort_key(vals)
            nk = len(skeys)
            sorted_ops = jax.lax.sort(
                skeys + (sval, valid.astype(jnp.int32), vals),
                num_keys=nk + 1,
                is_stable=True,
            )
            skeys_s = sorted_ops[:nk]
            sval_s = sorted_ops[nk]
            valid_s = sorted_ops[nk + 1].astype(jnp.bool_)
            sorted_vals_ref = (sorted_ops[nk + 2],)
            from ..ops.aggregate import sorted_first_flags

            key_first = sorted_first_flags(skeys_s)
            val_first = jnp.logical_or(
                key_first,
                jnp.concatenate(
                    [jnp.ones((1,), jnp.bool_), sval_s[1:] != sval_s[:-1]]
                ),
            )
            key_first = jnp.logical_and(key_first, valid_s)
            val_first = jnp.logical_and(val_first, valid_s)
            seg = jnp.cumsum(key_first.astype(jnp.int32)) - 1
            seg = jnp.where(valid_s, seg, capacity)
            if agg is AggregationType.COUNT_DISTINCT:
                return (
                    jnp.zeros((capacity,), jnp.int32)
                    .at[seg]
                    .add(val_first.astype(jnp.int32), mode="drop")
                ).astype(jnp.float32)
            # MEDIAN: values are sorted within each segment; gather the
            # middle element(s) via per-group start positions + counts.
            n_pad = sval_s.shape[0]
            pos = jnp.arange(n_pad, dtype=jnp.int32)
            starts = (
                jnp.zeros((capacity,), jnp.int32)
                .at[jnp.where(key_first, seg, capacity)]
                .max(pos, mode="drop")
            )
            counts = (
                jnp.zeros((capacity,), jnp.int32)
                .at[seg]
                .add(1, mode="drop")
            )
            c = jnp.maximum(counts, 1)
            # Linear interpolation at q·(c−1) — numpy's default scheme;
            # MEDIAN is q = 0.5 (reduces to the mean of the two middle
            # values for even counts).
            q = 0.5 if agg is AggregationType.MEDIAN else float(param)
            pos = q * (c - 1).astype(jnp.float32)
            lo_off = jnp.floor(pos).astype(jnp.int32)
            frac = pos - lo_off.astype(jnp.float32)
            lo_idx = jnp.clip(starts + lo_off, 0, n_pad - 1)
            hi_idx = jnp.clip(
                starts + jnp.minimum(lo_off + 1, c - 1), 0, n_pad - 1
            )
            vals_sorted = sorted_vals_ref[0]
            return (
                vals_sorted[lo_idx] * (1.0 - frac)
                + vals_sorted[hi_idx] * frac
            )

        return kernel

    out = np.asarray(get_or_compile(key, build)(cols, n_rows))
    return out[: int(num_groups)].astype(np.float32)


def _sorted_group(query, table, group_keys, vexpr_nodes, vexpr_canons,
                  where_canon, keys_canon, need=("sum", "min", "max")):
    from ..ops.aggregate import group_scatter_stage, group_sort_stage

    cols = table.columns
    n_rows = jnp.int32(table.num_rows)

    # Phase 1: ONE stable sort carrying keys + values, plus segment ids
    # and the distinct count.  The sorted arrays stay on device; only the
    # scalar count crosses to host to pick the capacity bucket — the
    # count pass and the aggregate pass share the sort (previously each
    # paid its own full O(N log² N) sort).
    #
    # A bare integer/string-code key column sorts on its RAW int bits
    # (int_sort_key): casting to f32 first would collide ids beyond 2^24
    # — exactly the high-cardinality ids that reach this path.
    raw_int = False
    if len(group_keys) == 1 and isinstance(group_keys[0], Variable):
        kd = table.dtypes.get(group_keys[0].name) or table.dtypes.get(
            group_keys[0].unqualified
        )
        raw_int = kd is not None and kd.value in ("int32", "int64", "string")

    skey = ("group_sort", keys_canon, tuple(vexpr_canons), where_canon,
            schema_signature(cols), raw_int, udf_mod.registry_version())

    def build_sort():
        from ..ops.sort import int_sort_key

        key_fns = [build_evaluator(k) for k in group_keys]
        raw_fn = _raw_or_f32_key_fn(group_keys[0], True) if raw_int else None
        val_fns = [build_evaluator(v) for v in vexpr_nodes]
        cond_fn = build_evaluator(query.where) if query.where is not None else None

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            vals = tuple(_broadcast(_as_f32(f(cols)), cols) for f in val_fns)
            if raw_int:
                raw = _broadcast(raw_fn(cols), cols)
                keys = (raw.astype(jnp.float32),)
                return group_sort_stage(
                    keys, vals, valid, skeys=(int_sort_key(raw),)
                )
            keys = tuple(_broadcast(_as_f32(f(cols)), cols) for f in key_fns)
            return group_sort_stage(keys, vals, valid)

        return kernel

    keys_s, vals_s, valid_s, seg, ng_dev = get_or_compile(skey, build_sort)(
        cols, n_rows
    )
    if table.padded_rows <= 4096:
        capacity = table.padded_rows
    else:
        ng = _cached_count(
            table,
            ("group_ng", keys_canon, where_canon, raw_int,
             udf_mod.registry_version()),
            lambda: ng_dev,
        )
        capacity = _next_pow2(max(ng, 16))

    # Phase 2: scatter the pre-sorted segments into capacity-sized tables.
    gkey = ("group_scatter", len(keys_canon), len(vexpr_canons),
            table.padded_rows, capacity, need)

    def build_scatter():
        @jax.jit
        def kernel(keys_s, vals_s, valid_s, seg, ng):
            return group_scatter_stage(
                tuple(keys_s), tuple(vals_s), valid_s, seg, ng, capacity,
                need,
            )

        return kernel

    result = jax.device_get(
        get_or_compile(gkey, build_scatter)(
            tuple(keys_s), tuple(vals_s), valid_s, seg, ng_dev
        )
    )

    num_groups = int(result.num_groups)
    keys = tuple(k[:num_groups] for k in result.keys)
    counts = result.counts[:num_groups]
    values = tuple(
        (v.sums[:num_groups], v.mins[:num_groups], v.maxs[:num_groups])
        for v in result.values
    )
    out = _HostGroupResult(keys, counts, values, num_groups)
    # COUNT(DISTINCT)/MEDIAN kernels must group keys exactly as this
    # path did — on raw int bits when the sort did.
    out.raw_int_key = raw_int
    return out


def _finish_grouped(query, select_items, specs, spec_to_vidx,
                    result: "_HostGroupResult", keys_canon) -> list[np.ndarray]:
    """Host-side finishing on the ≤G-sized aggregate table: evaluate each
    select item over (keys, aggregates), then HAVING, ORDER BY over
    groups, DISTINCT.  One list entry per select item, row-aligned."""
    num_groups = result.num_groups
    counts = result.counts
    key_arrays = [k for k in result.keys]
    agg_values = {}
    for spec in specs:
        vidx = spec_to_vidx[spec.key]
        if vidx == "cd":
            agg_values[spec.key] = result.dcounts[spec.key]
        else:
            agg_values[spec.key] = _agg_value_from_result(
                spec, counts, None if vidx is None else result.values[vidx]
            )
    key_canon_map = {c: key_arrays[i] for i, c in enumerate(keys_canon)}

    mask = np.ones(num_groups, dtype=bool)
    if query.having is not None:
        hv = _group_level_eval(query.having, key_canon_map, agg_values)
        hv = np.asarray(hv)
        mask &= hv if hv.dtype == bool else hv != 0

    order = None
    if query.order_by is not None:
        # Multi-term lexicographic sort; descending terms negate their
        # key (stable within ties, matching Python's reverse=True).
        keys = []
        for t in query.order_by.terms:
            v = _group_level_eval(t.expr, key_canon_map, agg_values)
            v = np.broadcast_to(
                np.asarray(v, dtype=np.float32), (num_groups,)
            )[mask]
            keys.append(v if t.ascending else -v)
        order = np.lexsort(tuple(reversed(keys)))
    # Default order is ascending by group key (groups emerge key-sorted).

    outs = []
    for item in select_items:
        vals = _group_level_eval(item, key_canon_map, agg_values)
        vals = np.broadcast_to(
            np.asarray(vals, dtype=np.float32), (num_groups,)
        )[mask]
        if order is not None:
            vals = vals[order]
        if query.distinct:
            vals = np.unique(np.asarray(vals, dtype=np.float32))
            if query.order_by is not None and not query.order_by.ascending:
                vals = vals[::-1]
        outs.append(np.ascontiguousarray(vals, dtype=np.float32))
    return outs


def _run_projection_multi(
    query: Query, table: DeviceTable, select_items: list
) -> list[np.ndarray]:
    """Non-grouped multi-item SELECT: ALL select expressions evaluate in
    one fused kernel, ride one stable sort (values carried side-by-side
    through the same comparator network) and one batched device→host
    transfer — row-aligned by construction."""
    cols = table.columns
    n_rows = jnp.int32(table.num_rows)
    where = query.where
    where_canon = where.canonical() if where is not None else ""
    order = query.order_by
    order_terms = order.terms if order is not None else ()
    items_canon = tuple(s.canonical() for s in select_items)
    order_canon = order.canonical() if order is not None else ""

    # Sorted result + LIMIT → static device-side prefix slice, so the
    # transfer is O(limit) per column, never O(N).
    limit_total = (query.limit or 0) + (query.offset or 0)
    sort_cap = 0
    if order is not None and query.limit is not None and limit_total > 0:
        sort_cap = min(table.padded_rows, _next_pow2(max(limit_total, 16)))

    # Order-preserving filtered multi-projection: two-phase compaction
    # so every column ships O(matches) (see _run_projection).
    filter_cap = 0
    if order is None and where is not None:
        ckey = ("project_count", where_canon, schema_signature(cols),
                udf_mod.registry_version())

        def build_count():
            cond_fn = build_evaluator(where)

            @jax.jit
            def kernel(cols, num_rows):
                valid = jnp.logical_and(
                    _valid_mask(cols, num_rows), _as_bool(cond_fn(cols))
                )
                return jnp.sum(valid.astype(jnp.int32))

            return kernel

        n_match = _cached_count(
            table,
            ("where_count", where.canonical(), udf_mod.registry_version()),
            lambda: jax.device_get(
                get_or_compile(ckey, build_count)(cols, n_rows)
            ),
        )
        filter_cap = min(_next_pow2(max(n_match, 16)), table.padded_rows)

    pkey = ("project_multi", items_canon, where_canon, order_canon, sort_cap,
            filter_cap, schema_signature(cols), udf_mod.registry_version())

    def build():
        sel_fns = [build_evaluator(s) for s in select_items]
        cond_fn = build_evaluator(where) if where is not None else None
        ord_fns = [
            (build_evaluator(t.expr), t.ascending) for t in order_terms
        ]

        @jax.jit
        def kernel(cols, num_rows):
            outs = tuple(
                _broadcast(_as_f32(f(cols)), cols) for f in sel_fns
            )
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            count = jnp.sum(valid.astype(jnp.int32))
            if not ord_fns:
                if cond_fn is None:
                    return outs, None, count
                # Stable position-sort compaction carrying every select
                # column; slice to the counted capacity.
                n_pad = outs[0].shape[0]
                pos = jnp.arange(n_pad, dtype=jnp.uint32)
                ck = jnp.where(valid, pos, jnp.uint32(0xFFFFFFFF))
                sorted_ops = jax.lax.sort(
                    (ck, *outs), num_keys=1, is_stable=True
                )
                return (
                    tuple(o[:filter_cap] for o in sorted_ops[1:]),
                    None,
                    count,
                )
            from ..ops.sort import order_key

            keys = []
            for i, (f, asc) in enumerate(ord_fns):
                kk = _broadcast(_as_f32(f(cols)), cols)
                keys.append(order_key(kk, valid if i == 0 else None, asc))
            nk = len(keys)
            sorted_ops = jax.lax.sort(
                (*keys, *outs, valid.astype(jnp.int32)),
                num_keys=nk,
                is_stable=True,
            )
            outs_s = sorted_ops[nk:-1]
            if sort_cap:
                outs_s = tuple(o[:sort_cap] for o in outs_s)
            return tuple(outs_s), None, count

        return kernel

    outs, _valid, count = jax.device_get(
        get_or_compile(pkey, build)(cols, n_rows)
    )
    count = int(count)
    return [out[:count].astype(np.float32) for out in outs]


def _run_projection(query: Query, table: DeviceTable, mesh=None) -> np.ndarray:
    """Non-grouped SELECT: one fused device program covering projection,
    WHERE filtering, ORDER BY (full sort or top-k) and DISTINCT, then a
    single batched device→host transfer.

    Filtering never uses device-side scatter compaction — 1-D
    scatter-to-computed-slots has no good TPU lowering (measured
    ~0.14 G rows/s) — instead every downstream operator consumes the
    validity mask directly (sorts/distinct push invalid lanes to the
    back via sentinels), and the order-preserving plain-projection case
    compacts with a two-phase stable position sort so the transfer is
    O(matches), never O(N) (shipping the padded column + mask through
    the relay dwarfed the sort cost)."""
    select = query.select_list[0]
    cols = table.columns
    n_rows = jnp.int32(table.num_rows)
    where = query.where
    where_canon = where.canonical() if where is not None else ""

    if isinstance(select, WindowFunction):
        return _run_window(query, table)
    if isinstance(select, Aggregation):
        # Global aggregate without GROUP BY: one group, whole table.
        return _run_global_agg(query, table)

    order = query.order_by
    order_terms = order.terms if order is not None else ()
    single_term = len(order_terms) == 1
    select_canon = select.canonical()
    order_canon = order.canonical() if order is not None else ""
    same_expr = (
        single_term and order_terms[0].expr.canonical() == select_canon
    )
    distinct = query.distinct
    if distinct:
        return _run_distinct(query, table, select)

    # ORDER BY ... LIMIT k on the select expression itself → top-k pull
    # instead of a full sort (the reference bubble-sorted everything,
    # jit.cpp:283-307).
    limit_total = (query.limit or 0) + (query.offset or 0)
    # The value-space top-k pull cannot represent the sort paths' NaN
    # total order, so it only runs when stats PROVE the order key is
    # finite (expr_range returns a finite interval: no NaN-able division
    # / UDFs / NaN-bearing columns); otherwise the full sort handles
    # NaN placement exactly.
    from .optimizer import expr_range

    order_nan_free = bool(
        order is not None
        and single_term
        and expr_range(order_terms[0].expr, table.stats) is not None
    )
    use_topk = (
        same_expr
        and not distinct
        and order_nan_free
        and query.limit is not None
        and 0 < limit_total < table.padded_rows // 2
    )
    topk_k = _next_pow2(max(limit_total, 16)) if use_topk else 0

    if use_topk and mesh is not None and mesh.devices.size > 1:
        # Distributed two-level pull: local top-k per shard, all_gather
        # of k*n_dev candidates over ICI, tiny finish.
        from ..parallel.sharded import run_topk_sharded

        out, total = run_topk_sharded(
            select, where, table, topk_k, order.ascending, mesh
        )
        return out[: min(limit_total, total)].astype(np.float32)

    # Full-sort path with a LIMIT: the sorted result is a prefix, so the
    # kernel slices to a static power-of-two cap on device — the
    # device→host transfer stays O(limit), never O(N).
    sort_cap = 0
    if (
        order is not None
        and not use_topk
        and query.limit is not None
        and limit_total > 0
    ):
        sort_cap = min(table.padded_rows, _next_pow2(max(limit_total, 16)))

    # Order-preserving filtered projection (no ORDER BY): two-phase so
    # the device→host transfer is O(matches), not O(N) — shipping the
    # full padded column + mask through the relay costs far more than
    # the counting pass + the stable position-sort compaction (the same
    # protocol the filtered-window path uses).
    filter_cap = 0
    if order is None and where is not None and not distinct:
        ckey = ("project_count", where_canon, schema_signature(cols),
                udf_mod.registry_version())

        def build_count():
            cond_fn = build_evaluator(where)

            @jax.jit
            def kernel(cols, num_rows):
                valid = jnp.logical_and(
                    _valid_mask(cols, num_rows), _as_bool(cond_fn(cols))
                )
                return jnp.sum(valid.astype(jnp.int32))

            return kernel

        n_match = _cached_count(
            table,
            ("where_count", where.canonical(), udf_mod.registry_version()),
            lambda: jax.device_get(
                get_or_compile(ckey, build_count)(cols, n_rows)
            ),
        )
        filter_cap = min(_next_pow2(max(n_match, 16)), table.padded_rows)

    pkey = ("project", select_canon, where_canon, order_canon, distinct,
            None if order is None else order.ascending, topk_k, sort_cap,
            filter_cap, schema_signature(cols), udf_mod.registry_version())

    def build():
        from ..ops.sort import sort_by_keys

        sel_fn = build_evaluator(select)
        cond_fn = build_evaluator(where) if where is not None else None
        ord_fns = (
            [(build_evaluator(t.expr), t.ascending) for t in order_terms]
            if order is not None and not same_expr
            else None
        )

        @jax.jit
        def kernel(cols, num_rows):
            vals = _broadcast(_as_f32(sel_fn(cols)), cols)
            n_pad = vals.shape[0]
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            count = jnp.sum(valid.astype(jnp.int32))

            if order is not None:
                if ord_fns is None:
                    if topk_k:
                        out = top_k_values(vals, valid, topk_k, order.ascending)
                    else:
                        out = sort_values(vals, valid, order.ascending)
                elif single_term:
                    okeys = _broadcast(_as_f32(ord_fns[0][0](cols)), cols)
                    out, _ = sort_pairs(okeys, vals, valid, order.ascending)
                else:
                    keys = [
                        (_broadcast(_as_f32(f(cols)), cols), asc)
                        for f, asc in ord_fns
                    ]
                    out = sort_by_keys(keys, vals, valid)
                if sort_cap:
                    out = out[:sort_cap]
                return out, None, count
            if cond_fn is None:
                # Dense already: rows [0, num_rows) are the result.
                return vals, None, count
            # Order-preserving compaction: stable sort on original
            # position with an invalid-last key, sliced to the counted
            # capacity — the transfer is O(matches).
            pos = jnp.arange(n_pad, dtype=jnp.uint32)
            ck = jnp.where(valid, pos, jnp.uint32(0xFFFFFFFF))
            _, vals_c = jax.lax.sort((ck, vals), num_keys=1, is_stable=True)
            return vals_c[:filter_cap], None, count

        return kernel

    out, valid, count = jax.device_get(
        get_or_compile(pkey, build)(cols, n_rows)
    )
    count = int(count)

    if use_topk:
        return out[: min(limit_total, count)].astype(np.float32)
    if valid is not None:
        return out[valid].astype(np.float32)
    return out[:count].astype(np.float32)


def _run_distinct(query: Query, table: DeviceTable, select) -> np.ndarray:
    """DISTINCT with the two-phase static-shape protocol: a counting pass
    sizes a power-of-two capacity, the second pass returns only a
    capacity-sized buffer — so the device→host transfer is O(distinct),
    not O(N) (a 33M-row DISTINCT of 32 values previously shipped the full
    padded column)."""
    cols = table.columns
    n_rows = jnp.int32(table.num_rows)
    where = query.where
    where_canon = where.canonical() if where is not None else ""
    select_canon = select.canonical()
    order = query.order_by

    # Sort-free DISTINCT: a stats-bounded integral expression is just a
    # GROUP BY on itself with COUNT-only reductions — the dense/midrange
    # ladder (VPU sweep / scatter / MXU histogram) returns the occupied
    # keys with no sort and an O(distinct) transfer.  LIMIT pushes down
    # when the ascending default order is what ships.
    limit_cap = None
    if query.limit is not None and (order is None or order.ascending):
        limit_cap = query.limit + (query.offset or 0)
    dres = _try_dense_group(
        query, table, [select], [Constant("1")], ["1.0f"], where_canon,
        need=(), limit_cap=limit_cap,
    )
    if dres is not None:
        values = np.asarray(dres.keys[0], np.float32)
        if order is not None and not order.ascending:
            values = values[::-1].copy()
        return values

    from ..ops.aggregate import group_scatter_stage, group_sort_stage

    # Phase 1: one sort (shared with the scatter phase, like GROUP BY).
    ckey = ("distinct_sort", select_canon, where_canon,
            schema_signature(cols), udf_mod.registry_version())

    def build_sort():
        sel_fn = build_evaluator(select)
        cond_fn = build_evaluator(where) if where is not None else None

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            vals = _broadcast(_as_f32(sel_fn(cols)), cols)
            return group_sort_stage((vals,), (), valid)

        return kernel

    keys_s, _vals_s, valid_s, seg, ng_dev = get_or_compile(
        ckey, build_sort
    )(cols, n_rows)
    n_uniq = _cached_count(
        table,
        ("distinct_ng", select_canon, where_canon,
         udf_mod.registry_version()),
        lambda: ng_dev,
    )
    capacity = min(_next_pow2(max(n_uniq, 16)), table.padded_rows)

    dkey = ("distinct_scatter", table.padded_rows, capacity)

    def build_scatter():
        @jax.jit
        def kernel(keys_s, valid_s, seg, ng):
            g = group_scatter_stage(
                tuple(keys_s), (), valid_s, seg, ng, capacity, need=()
            )
            return g.keys[0], g.num_groups

        return kernel

    uniq, n = jax.device_get(
        get_or_compile(dkey, build_scatter)(
            tuple(keys_s), valid_s, seg, ng_dev
        )
    )
    values = uniq[: int(n)]
    # Reference order: DISTINCT produces ascending (host sort+unique,
    # warpdb.cpp:463-468); ORDER BY then re-sorts — meaningful when it
    # names the same expression (having_distinct_test.cpp:9-11).
    if order is not None and not order.ascending:
        values = values[::-1].copy()
    return values.astype(np.float32)


def _run_global_agg(query: Query, table: DeviceTable) -> np.ndarray:
    """SELECT AGG(expr) with no GROUP BY → single scalar."""
    select = query.select_list[0]
    cols = table.columns
    where = query.where
    key = ("global_agg", select.canonical(),
           where.canonical() if where else "",
           schema_signature(cols), udf_mod.registry_version())

    def build():
        val_fn = build_evaluator(select.expr)
        cond_fn = build_evaluator(where) if where is not None else None
        agg = select.agg

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            vals = _broadcast(_as_f32(val_fn(cols)), cols)
            cnt = jnp.sum(valid.astype(jnp.float32))
            if agg is AggregationType.COUNT_DISTINCT:
                return count_distinct((vals,), valid).astype(jnp.float32)
            if agg in (
                AggregationType.MEDIAN, AggregationType.PERCENTILE
            ):
                from ..ops.sort import sort_values

                v = sort_values(vals, valid, ascending=True)
                c = jnp.maximum(cnt.astype(jnp.int32), 1)
                q = (
                    0.5
                    if agg is AggregationType.MEDIAN
                    else float(select.param)
                )
                pos = q * (c - 1).astype(jnp.float32)
                lo_off = jnp.floor(pos).astype(jnp.int32)
                frac = pos - lo_off.astype(jnp.float32)
                lo = v[jnp.clip(lo_off, 0, v.shape[0] - 1)]
                hi = v[
                    jnp.clip(
                        jnp.minimum(lo_off + 1, c - 1), 0, v.shape[0] - 1
                    )
                ]
                return lo * (1.0 - frac) + hi * frac
            if agg is AggregationType.COUNT:
                return cnt
            if agg is AggregationType.SUM:
                return jnp.sum(jnp.where(valid, vals, 0.0))
            if agg is AggregationType.AVG:
                return jnp.sum(jnp.where(valid, vals, 0.0)) / jnp.maximum(cnt, 1.0)
            if agg is AggregationType.MIN:
                return jnp.min(jnp.where(valid, vals, jnp.inf))
            return jnp.max(jnp.where(valid, vals, -jnp.inf))

        return kernel

    out = get_or_compile(key, build)(cols, jnp.int32(table.num_rows))
    return np.asarray([float(out)], dtype=np.float32)


def _run_window(query: Query, table: DeviceTable) -> np.ndarray:
    """SELECT AGG(e) OVER (PARTITION BY …) — executes what the reference
    stubbed (expression.hpp:112-121)."""
    select: WindowFunction = query.select_list[0]
    cols = table.columns
    where = query.where
    if not select.partition_by:
        part_exprs: tuple = ()
    else:
        part_exprs = select.partition_by
    outer_order = query.order_by

    # Two-phase when a WHERE can shrink the result: count survivors,
    # then the window kernel compacts valid rows to the front (stable
    # sort on original position — order-preserving) and returns only a
    # capacity-sized buffer, so the device→host transfer is O(matches),
    # not O(N).
    out_cap = table.padded_rows
    if where is not None:
        ckey = ("window_count", where.canonical(),
                schema_signature(cols), udf_mod.registry_version())

        def build_count():
            cond_fn = build_evaluator(where)

            @jax.jit
            def kernel(cols, num_rows):
                valid = jnp.logical_and(
                    _valid_mask(cols, num_rows), _as_bool(cond_fn(cols))
                )
                return jnp.sum(valid.astype(jnp.int32))

            return kernel

        n_match = _cached_count(
            table,
            ("where_count", where.canonical(), udf_mod.registry_version()),
            lambda: jax.device_get(
                get_or_compile(ckey, build_count)(
                    cols, jnp.int32(table.num_rows)
                )
            ),
        )
        out_cap = min(_next_pow2(max(n_match, 16)), table.padded_rows)

    # Sort-free window path: a plain partition aggregate over a
    # stats-bounded integer partition key needs neither the partition
    # sort nor the scatter-back (ops/aggregate.dense_window_aggregate).
    dense_cfg = None  # (base, num_slots, integral_static)
    if (
        select.order_by is None
        and select.agg.value in ("sum", "avg", "count", "min", "max")
        and len(part_exprs) <= 1
    ):
        from ..config import get_config
        from .optimizer import expr_range

        if not part_exprs:
            dense_cfg = (0, 1, True)
        else:
            rng = expr_range(part_exprs[0], table.stats)
            if rng is not None and np.isfinite(rng[0]) and np.isfinite(
                rng[1]
            ):
                base = int(np.floor(rng[0]))
                num_slots = int(np.floor(rng[1])) - base + 1
                if (
                    1 <= num_slots <= get_config().dense_group_max_slots
                    and -(2**31) <= base
                    and base + num_slots <= 2**31 - 1
                ):
                    integral_static, ok = _integral_key_check(
                        table, part_exprs[0]
                    )
                    if ok:
                        dense_cfg = (base, num_slots, integral_static)

    key = ("window", select.canonical(),
           where.canonical() if where else "",
           outer_order.canonical() if outer_order else "",
           schema_signature(cols), table.padded_rows, out_cap, dense_cfg,
           udf_mod.registry_version())

    shift_dir = {
        AggregationType.LAG: 1,
        AggregationType.LEAD: -1,
    }.get(select.agg, 0)
    if shift_dir and select.order_by is None:
        raise UnsupportedError(
            "LAG/LEAD require an ORDER BY inside OVER (...)"
        )

    def build():
        from ..ops.aggregate import (
            dense_window_aggregate,
            window_rank,
            window_running,
            window_shift,
        )

        ranking = select.agg in (
            AggregationType.ROW_NUMBER,
            AggregationType.RANK,
            AggregationType.DENSE_RANK,
        )
        val_fn = build_evaluator(select.expr)
        part_fns = [build_evaluator(p) for p in part_exprs]
        cond_fn = build_evaluator(where) if where is not None else None
        ord_fn = (
            build_evaluator(select.order_by.expr)
            if select.order_by is not None
            else None
        )
        ord_asc = select.order_by.ascending if select.order_by else True
        outer_fns = (
            [
                (build_evaluator(t.expr), t.ascending)
                for t in outer_order.terms
            ]
            if outer_order is not None
            else None
        )
        agg_name = select.agg.value
        capacity = table.padded_rows

        def _finish(win, valid, cols):
            if outer_fns is not None:
                # Outer ORDER BY over the per-row window results.
                from ..ops.sort import sort_by_keys

                keys = [
                    (_broadcast(_as_f32(f(cols)), cols), asc)
                    for f, asc in outer_fns
                ]
                win_sorted = sort_by_keys(keys, win, valid)
                count = jnp.sum(valid.astype(jnp.int32))
                return win_sorted[:out_cap], None, count
            if cond_fn is not None:
                # Compact survivors to the front, preserving row order:
                # stable sort on original position with an invalid-last
                # key.  (A Pallas MXU-pack/rotate-accumulate compaction
                # kernel was tried and removed — DESIGN.md §4 records
                # the verdict.)
                n_pad = win.shape[0]
                pos = jnp.arange(n_pad, dtype=jnp.uint32)
                ck = jnp.where(valid, pos, jnp.uint32(0xFFFFFFFF))
                _, win_c = jax.lax.sort((ck, win), num_keys=1, is_stable=True)
                count = jnp.sum(valid.astype(jnp.int32))
                return win_c[:out_cap], None, count
            return win, valid, None

        dense_part_fn = (
            _raw_or_f32_key_fn(part_exprs[0], dense_cfg[2])
            if dense_cfg is not None and part_exprs
            else None
        )

        @jax.jit
        def kernel(cols, num_rows):
            valid = _valid_mask(cols, num_rows)
            if cond_fn is not None:
                valid = jnp.logical_and(valid, _as_bool(cond_fn(cols)))
            vals = _broadcast(_as_f32(val_fn(cols)), cols)
            if dense_cfg is not None:
                pk = (
                    _broadcast(dense_part_fn(cols), cols)
                    if dense_part_fn is not None
                    else jnp.zeros_like(vals)
                )
                win = dense_window_aggregate(
                    pk, vals, valid, agg_name, dense_cfg[0], dense_cfg[1]
                )
                return _finish(win, valid, cols)
            if part_fns:
                part = tuple(
                    _broadcast(_as_f32(f(cols)), cols) for f in part_fns
                )
            else:
                part = (jnp.zeros_like(vals),)
            if ord_fn is not None:
                okeys = _broadcast(_as_f32(ord_fn(cols)), cols)
            else:
                okeys = None
            if shift_dir:
                win = window_shift(
                    part, okeys, vals, valid, shift_dir, ascending=ord_asc
                )
            elif ranking:
                # ROW_NUMBER/RANK; without ORDER BY, row order decides.
                n_pad = vals.shape[0]
                ok = (
                    okeys
                    if okeys is not None
                    else jnp.arange(n_pad, dtype=jnp.float32)
                )
                win = window_rank(
                    part, ok, valid, agg_name,
                    ascending=ord_asc if okeys is not None else True,
                )
            elif okeys is not None:
                # Running aggregate over the window's ORDER BY — what the
                # reference parsed and threw away (expression.cpp:296-329).
                win = window_running(
                    part, okeys, vals, valid, agg_name, ascending=ord_asc
                )
            else:
                win = window_aggregate(part, vals, valid, agg_name, capacity)
            return _finish(win, valid, cols)

        return kernel

    win, valid, count = jax.device_get(
        get_or_compile(key, build)(cols, jnp.int32(table.num_rows))
    )
    if valid is None:
        # Outer ORDER BY path: valid rows sorted to the front.
        return win[: int(count)].astype(np.float32)
    # Host boolean gather (order-preserving; no device scatter).
    return win[valid].astype(np.float32)


def result_column_name(item, i: int, taken) -> str:
    """Output column name for a select item: its alias, else its
    canonical form minus the ``[idx]`` suffix; collisions get ``_i``.
    Shared by the in-memory table API and the streaming SQL path so both
    label identical SQL identically."""
    if isinstance(item, Alias):
        name = item.name
    else:
        name = item.canonical()
        if name.endswith("[idx]"):
            name = name[: -len("[idx]")]
    if name in taken:
        name = f"{name}_{i}"
    return name


def run_query_table(
    query: Query,
    table: DeviceTable,
    catalog: Optional[dict] = None,
    mesh=None,
) -> dict:
    """Execute a SELECT returning every select-list item as a named
    column (the reference returned only the first expression's values,
    warpdb.cpp:447-459 — this exceeds it).

    Rows stay aligned across columns: each item runs through the same
    WHERE/ORDER machinery (stable sorts over identical masks/keys).
    DISTINCT is single-column by construction and rejected here.
    """
    import copy as _copy

    if query.distinct and len(query.select_list) > 1:
        raise UnsupportedError("DISTINCT with multiple select items")

    expanded = expand_stars_query(query, table, catalog)
    if expanded is not query.select_list:
        query = _copy.copy(query)
        query.select_list = expanded

    if query.joins:
        if query.group_by is not None:
            rewritten = _try_eager_join_aggregate(query, table, catalog, mesh)
            if rewritten is not None:
                query, catalog = rewritten
        # Materialise the join chain ONCE, then execute the join-free
        # remainder on the joined table — previously each select item
        # re-ran the whole join (kernels were cached; the device work
        # was not).
        joined = _materialize_joins(query, table, catalog, mesh=mesh)
        q2 = _copy.copy(query)
        q2.joins = ()
        return run_query_table(q2, joined, catalog, mesh=mesh)

    out_name = result_column_name

    def empty_result() -> dict:
        out: dict = {}
        for i, item in enumerate(query.select_list):
            out[out_name(item, i, out)] = np.zeros(0, np.float32)
        return out

    if query.group_by is not None and not query.joins:
        # One grouped pass serves every select item (row-aligned columns).
        q = _bind_query_strings(query, table)
        if q is query:
            q = _copy.copy(query)
        if q.where is not None:
            from .optimizer import analyze_condition, fold_constants

            w = fold_constants(q.where)
            verdict = analyze_condition(w, table.stats)
            q.where = None if verdict is True else w
            if verdict is False:
                return empty_result()
        items = [unalias(s) for s in q.select_list]
        cols = _run_grouped_multi(q, table, items, mesh=mesh)
        out = {}
        for i, (item, vals) in enumerate(zip(query.select_list, cols)):
            if query.offset is not None:
                vals = (
                    vals[query.offset :]
                    if query.offset < len(vals)
                    else vals[:0]
                )
            if query.limit is not None and query.limit < len(vals):
                vals = vals[: query.limit]
            out[out_name(item, i, out)] = vals
        return out

    # Non-grouped, join-free multi-item SELECT: one fused kernel, one
    # sort, one transfer for every column.
    items = [unalias(s) for s in query.select_list]
    simple = (
        query.group_by is None
        and not query.joins
        and not query.distinct
        and len(items) > 1
        and all(
            not isinstance(n, (Aggregation, WindowFunction))
            for item in items
            for n in walk(item)
        )
    )
    if simple:
        q = _copy.copy(query)
        if query.where is not None:
            from .optimizer import analyze_condition, fold_constants

            w = fold_constants(query.where)
            verdict = analyze_condition(w, table.stats)
            if verdict is False:
                return empty_result()
            q.where = None if verdict is True else w
        q = _bind_query_strings(q, table)
        cols_out = _run_projection_multi(
            q, table, [unalias(s) for s in q.select_list]
        )
        out = {}
        for i, (item, vals) in enumerate(zip(query.select_list, cols_out)):
            if query.offset is not None:
                vals = (
                    vals[query.offset :]
                    if query.offset < len(vals)
                    else vals[:0]
                )
            if query.limit is not None and query.limit < len(vals):
                vals = vals[: query.limit]
            out[out_name(item, i, out)] = vals
        return out

    out = {}
    for i, item in enumerate(query.select_list):
        q = _copy.copy(query)
        q.select_list = [item]
        out[out_name(item, i, out)] = run_query(q, table, catalog, mesh=mesh)
    return out
