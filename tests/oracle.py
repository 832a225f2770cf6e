"""Pure-NumPy reference oracle for query semantics.

Independent re-implementation of the intended reference behavior
(SURVEY.md §4: "row-level operator results vs a NumPy/pure-Python
reference oracle").  Deliberately simple and slow — row-at-a-time where
possible — so it cannot share bugs with the vectorized engine.
"""

from __future__ import annotations

import numpy as np

from warpdb_tpu.frontend import (
    Aggregation,
    AggregationType,
    BinaryOp,
    Constant,
    FunctionCall,
    Variable,
    WindowFunction,
)
from warpdb_tpu.frontend.ast import Alias, CaseWhen, Star


def eval_expr(node, table: dict, n: int) -> np.ndarray:
    """Evaluate an expression AST rowwise over dict-of-numpy columns."""
    if isinstance(node, Alias):
        return eval_expr(node.expr, table, n)
    if isinstance(node, Star):
        return np.ones(n, dtype=np.float32)
    if isinstance(node, Constant):
        return np.full(n, np.float32(node.value), dtype=np.float32)
    if isinstance(node, Variable):
        name = node.name if node.name in table else node.unqualified
        return np.asarray(table[name], dtype=np.float32)
    if isinstance(node, BinaryOp):
        l = eval_expr(node.left, table, n)
        r = eval_expr(node.right, table, n)
        op = node.op
        if op == "+":
            return (l + r).astype(np.float32)
        if op == "-":
            return (l - r).astype(np.float32)
        if op == "*":
            return (l * r).astype(np.float32)
        if op == "/":
            with np.errstate(divide="ignore", invalid="ignore"):
                return (l / r).astype(np.float32)
        if op == "%":
            with np.errstate(invalid="ignore"):
                return np.fmod(l, r).astype(np.float32)
        if op == "&&":
            return ((l != 0) & (r != 0)).astype(np.float32)
        if op == "||":
            return ((l != 0) | (r != 0)).astype(np.float32)
        cmp = {
            ">": np.greater, "<": np.less, ">=": np.greater_equal,
            "<=": np.less_equal, "==": np.equal, "=": np.equal,
            "!=": np.not_equal,
        }[op]
        return cmp(l, r).astype(np.float32)
    if isinstance(node, CaseWhen):
        out = (
            eval_expr(node.default, table, n)
            if node.default is not None
            else np.zeros(n, np.float32)
        )
        for c, v in zip(reversed(node.conditions), reversed(node.values)):
            m = eval_expr(c, table, n) != 0
            out = np.where(m, eval_expr(v, table, n), out)
        return out.astype(np.float32)
    if isinstance(node, FunctionCall):
        if node.name == "discount":
            a = eval_expr(node.args[0], table, n)
            b = eval_expr(node.args[1], table, n)
            return (a * b).astype(np.float32)
        def _coalesce(*args):
            out = args[-1]
            for a in reversed(args[:-1]):
                out = np.where(np.isnan(a), out, a)
            return out

        builtins = {
            "abs": np.abs, "sqrt": np.sqrt, "log": np.log, "exp": np.exp,
            "round": np.round, "floor": np.floor, "ceil": np.ceil,
            "pow": np.power, "minimum": np.minimum, "maximum": np.maximum,
            "isnan": lambda x: np.isnan(x),
            "trunc": np.trunc, "sign": np.sign, "fmod": np.fmod,
            "nullval": lambda: np.float32(np.nan),
            "coalesce": _coalesce,
            "nullif": lambda a, b: np.where(a == b, np.float32(np.nan), a),
            "greatest": lambda *a: np.maximum.reduce(list(a)),
            "least": lambda *a: np.minimum.reduce(list(a)),
        }
        fn = builtins.get(node.name) or builtins.get(node.name.lower())
        if fn is not None:
            args = [eval_expr(a, table, n) for a in node.args]
            return np.asarray(fn(*args)).astype(np.float32)
        raise NotImplementedError(node.name)
    raise NotImplementedError(type(node).__name__)


def query_expression(table: dict, expr_ast, cond_ast=None) -> np.ndarray:
    """WarpDB::query semantics: length-N, filtered-out slots = 0.0."""
    n = len(next(iter(table.values())))
    out = eval_expr(expr_ast, table, n)
    if cond_ast is not None:
        mask = eval_expr(cond_ast, table, n) != 0
        out = np.where(mask, out, np.float32(0.0))
    return out.astype(np.float32)


def _agg(agg_type, values: np.ndarray) -> float:
    if agg_type is AggregationType.SUM:
        return float(np.sum(values, dtype=np.float64))
    if agg_type is AggregationType.AVG:
        return float(np.mean(values)) if len(values) else 0.0
    if agg_type is AggregationType.COUNT:
        return float(len(values))
    if agg_type is AggregationType.COUNT_DISTINCT:
        return float(len(np.unique(values)))
    if agg_type is AggregationType.MEDIAN:
        return float(np.median(values)) if len(values) else 0.0
    if agg_type is AggregationType.MIN:
        return float(np.min(values)) if len(values) else np.inf
    if agg_type is AggregationType.MAX:
        return float(np.max(values)) if len(values) else -np.inf
    raise NotImplementedError(agg_type)


def eval_group_expr(node, group_rows: dict, table: dict, key_value: float, key_canon: str):
    """Evaluate a select/HAVING/ORDER BY expression for one group."""
    if isinstance(node, Alias):
        return eval_group_expr(node.expr, group_rows, table, key_value, key_canon)
    if isinstance(node, Aggregation):
        n = len(next(iter(table.values())))
        vals = eval_expr(node.expr, table, n)[group_rows["idx"]]
        return _agg(node.agg, vals)
    if isinstance(node, Constant):
        return float(node.value)
    if isinstance(node, BinaryOp):
        l = eval_group_expr(node.left, group_rows, table, key_value, key_canon)
        r = eval_group_expr(node.right, group_rows, table, key_value, key_canon)
        return {
            "+": lambda: l + r, "-": lambda: l - r, "*": lambda: l * r,
            "/": lambda: l / r, ">": lambda: float(l > r),
            "<": lambda: float(l < r), ">=": lambda: float(l >= r),
            "<=": lambda: float(l <= r), "==": lambda: float(l == r),
            "=": lambda: float(l == r), "!=": lambda: float(l != r),
            "&&": lambda: float(l != 0 and r != 0),
            "||": lambda: float(l != 0 or r != 0),
        }[node.op]()
    if node.canonical() == key_canon:
        return key_value
    raise NotImplementedError(node.canonical())


def query_sql(table: dict, query) -> np.ndarray:
    """Intended query_sql semantics (grouped + non-grouped paths)."""
    n = len(next(iter(table.values())))
    rows = np.arange(n)
    if query.where is not None:
        mask = eval_expr(query.where, table, n) != 0
        rows = rows[mask]

    select = query.select_list[0]
    if isinstance(select, Alias):
        select = select.expr

    if query.group_by is not None:
        key_expr = query.group_by.keys[0]
        key_canon = key_expr.canonical()
        keys = eval_expr(key_expr, table, n)[rows]
        result = []
        for k in sorted(set(keys.tolist())):
            g_idx = rows[keys == k]
            group = {"idx": g_idx}
            if query.having is not None:
                hv = eval_group_expr(query.having, group, table, k, key_canon)
                if hv == 0:
                    continue
            sel_val = eval_group_expr(select, group, table, k, key_canon)
            order_val = (k,)
            if query.order_by is not None:
                order_val = tuple(
                    eval_group_expr(t.expr, group, table, k, key_canon)
                    * (1.0 if t.ascending else -1.0)
                    for t in query.order_by.terms
                )
            result.append((order_val, np.float32(sel_val)))
        result.sort(key=lambda t: t[0])
        out = np.array([v for _, v in result], dtype=np.float32)
    else:
        if isinstance(select, WindowFunction):
            vals = eval_expr(select.expr, table, n)
            if select.partition_by:
                part = eval_expr(select.partition_by[0], table, n)
            else:
                part = np.zeros(n, np.float32)
            out_full = np.zeros(n, np.float32)
            for k in set(part[rows].tolist()):
                g = rows[part[rows] == k]
                out_full[g] = np.float32(_agg(select.agg, vals[g]))
            out = out_full[rows].astype(np.float32)
        elif isinstance(select, Aggregation):
            vals = eval_expr(select.expr, table, n)[rows]
            out = np.array([_agg(select.agg, vals)], dtype=np.float32)
        else:
            out = eval_expr(select, table, n)[rows]
            if query.order_by is not None:
                keys = []
                for t in query.order_by.terms:
                    kv = eval_expr(t.expr, table, n)[rows]
                    keys.append(kv if t.ascending else -kv)
                out = out[np.lexsort(tuple(reversed(keys)))]
        if query.distinct:
            out = np.unique(out)
            if query.order_by is not None and not query.order_by.ascending:
                out = out[::-1]

    if query.offset is not None:
        out = out[query.offset:] if query.offset < len(out) else out[:0]
    if query.limit is not None:
        out = out[: query.limit]
    return np.asarray(out, dtype=np.float32)
