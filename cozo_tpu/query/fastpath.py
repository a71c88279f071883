"""Straight-line fast path for point/prefix lookups.

The general pipeline (normalize → stratify → magic → RA compile →
semi-naive eval, reference `runtime/db.rs:1455-1685`) costs ~300µs of
host work per execution even for `?[v] := *kv{k: $k, v}`.  OLTP point
ops are the reference's headline (>250K read QPS, README.md:141-143),
so single-atom retrievals compile once into a PointPlan: encode key
prefix → KV get/prefix-scan → project, with results identical to the
general path (set semantics, memcmp output order).

A script is fast-pathable when it is a single `?` rule whose body is one
stored-relation atom with a constant/parameter key prefix, every other
column free or constant, no aggregations, and no out-options beyond
limit/offset.  Anything else falls back to the general pipeline; any
runtime surprise (validity relation, unknown column, repeated binding)
returns MISS and re-runs the query through the general path so error
messages and semantics stay canonical."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..data.expr import Binding, Const, ParamRef
from ..data.memcmp import encode_tuple
from ..data.program import InputProgram, InputRule, RelationApplyAtom
from ..data.relation_types import coerce_value
from ..data.value import deep_freeze, value_eq
from ..utils.errors import CozoError, QueryError

MISS = object()


class PointPlan:
    __slots__ = ("rel", "pairs", "head", "limit", "offset")

    def __init__(self, rel: str, pairs, head, limit, offset) -> None:
        self.rel = rel
        self.pairs = pairs  # [(col_name, expr)]
        self.head = head  # [var, ...]
        self.limit = limit
        self.offset = offset


class CountPlan:
    __slots__ = ("rel", "pairs", "header")

    def __init__(self, rel: str, pairs, header: str) -> None:
        self.rel = rel
        self.pairs = pairs
        self.header = header


def analyze(prog: InputProgram):
    oo = prog.out_opts
    if (
        oo.store_relation is not None
        or oo.sorters
        or oo.timeout is not None
        or oo.sleep is not None
        or oo.assert_none
        or oo.assert_some
        or oo.returning
    ):
        return None
    if set(prog.rules.keys()) != {"?"}:
        return None
    rules = prog.rules["?"]
    if len(rules) != 1:
        return None
    r = rules[0]
    if not isinstance(r, InputRule):
        return None
    if len(r.body) != 1 or not isinstance(r.body[0], RelationApplyAtom):
        return None
    atom = r.body[0]
    if atom.validity is not None or atom.pairs is None or atom.name.startswith("_"):
        return None
    for _, e in atom.pairs:
        if not isinstance(e, (Const, ParamRef, Binding)):
            return None
    aggrs = [a for a in r.aggrs if a is not None]
    if not aggrs:
        return PointPlan(
            atom.name, list(atom.pairs), list(r.head), oo.limit, oo.offset
        )
    # `?[count(v)] := *rel{...}`: answerable as a key-range count when the
    # bound columns cover every key column (then distinct bodies == rows)
    if (
        len(r.head) == 1
        and len(aggrs) == 1
        and aggrs[0].name == "count"
        and oo.limit is None
        and oo.offset is None
    ):
        return CountPlan(atom.name, list(atom.pairs), f"count({r.head[0]})")
    return None


def _resolve(e, params: Dict[str, Any]):
    if isinstance(e, Const):
        return e.val
    if e.name not in params:
        raise QueryError(
            f"Required parameter {e.name} not found",
            code="parser::param_not_found",
        )
    return deep_freeze(params[e.name])


def _execute_count(plan: CountPlan, db, params: Dict[str, Any], tx):
    """Key-range count for `?[count(v)] := *rel{..}` shapes, or MISS."""
    from ..runtime.db import NamedRows
    from ..runtime.relation import encode_key

    handle = db_get_handle(db, tx, plan.rel)
    if handle is None or handle.has_validity() or handle.is_temp:
        return MISS
    if handle.access_level not in ("normal", "protected", "read_only"):
        return MISS
    cols = handle.keys + handle.values
    col_idx = {c.name: i for i, c in enumerate(cols)}
    nk = len(handle.keys)
    bound_cols = set()
    seen_vars = set()
    exprs: Dict[int, object] = {}
    for name, e in plan.pairs:
        i = col_idx.get(name)
        if i is None:
            return MISS
        if isinstance(e, Binding):
            if name in bound_cols or e.var in seen_vars:
                return MISS  # repeated var = intra-row equality constraint
            bound_cols.add(name)
            seen_vars.add(e.var)
        else:
            exprs[i] = e
    prefix_vals = []
    for i in range(nk):
        e = exprs.get(i)
        if e is None:
            break
        val = _resolve(e, params)
        typing = cols[i].typing
        if typing is not None:
            try:
                val = coerce_value(val, typing)
            except CozoError:
                return NamedRows([plan.header], [[0]])
        prefix_vals.append(val)
    # const filters beyond the prefix, or key columns not individually
    # bound (distinct bodies could collapse): general path
    if any(i >= len(prefix_vals) for i in exprs):
        return MISS
    for i in range(len(prefix_vals), nk):
        if cols[i].name not in bound_cols:
            return MISS
    lower = encode_key(handle.id, prefix_vals)
    upper = lower + b"\xff" * 8
    n = tx.range_count(lower, upper)
    return NamedRows([plan.header], [[n]])


def execute(plan, db, params: Dict[str, Any], cur_vld: int):
    """Returns a NamedRows or MISS (caller falls back to the general path)."""
    from ..runtime.db import NamedRows

    tx = db.storage.transact(write=False)
    try:
        if isinstance(plan, CountPlan):
            return _execute_count(plan, db, params, tx)
        try:
            handle = db_get_handle(db, tx, plan.rel)
        except CozoError:
            return MISS  # canonical error comes from the general path
        if handle is None or handle.has_validity() or handle.is_temp:
            return MISS
        if handle.access_level not in ("normal", "protected", "read_only"):
            return MISS
        cols = handle.keys + handle.values
        col_idx = {c.name: i for i, c in enumerate(cols)}
        nk = len(handle.keys)
        bind_col: Dict[str, int] = {}
        exprs: List[Optional[object]] = [None] * len(cols)
        for name, e in plan.pairs:
            i = col_idx.get(name)
            if i is None:
                return MISS
            if isinstance(e, Binding):
                if e.var in bind_col:
                    return MISS  # intra-row equality: general path
                bind_col[e.var] = i
            else:
                exprs[i] = e
        for v in plan.head:
            if v not in bind_col:
                return MISS

        # constant/param key prefix
        prefix_vals = []
        for i in range(nk):
            e = exprs[i]
            if e is None:
                break
            val = _resolve(e, params)
            typing = cols[i].typing
            if typing is not None:
                try:
                    val = coerce_value(val, typing)
                except CozoError:
                    return NamedRows(list(plan.head), [])  # unmatchable key
            prefix_vals.append(val)
        # equality post-filters (consts outside the prefix)
        filters = []
        for i, e in enumerate(exprs):
            if e is not None and i >= len(prefix_vals):
                filters.append((i, _resolve(e, params)))

        head_cols = [bind_col[v] for v in plan.head]

        if len(prefix_vals) == nk and not filters:
            row = handle.get_row(tx, prefix_vals)
            rows = [] if row is None else [[row[i] for i in head_cols]]
        else:
            rows = []
            limit = plan.limit
            fetch_cap = None
            # without post-filters/dedup-risk, stop the scan at limit+offset
            key_bound = {i for i in range(len(prefix_vals), nk)}
            dedup_free = key_bound <= set(head_cols)
            if limit is not None and not filters and dedup_free:
                fetch_cap = limit + (plan.offset or 0)
            for row in handle.scan_prefix(tx, prefix_vals):
                ok = True
                for i, want in filters:
                    if not value_eq(row[i], want):
                        ok = False
                        break
                if ok:
                    rows.append([row[i] for i in head_cols])
                    if fetch_cap is not None and len(rows) >= fetch_cap:
                        break
            if len(rows) > 1:
                # set semantics + memcmp output order, as the general
                # path's memo store produces
                seen = set()
                uniq = []
                for r_ in rows:
                    kb = encode_tuple(r_)
                    if kb not in seen:
                        seen.add(kb)
                        uniq.append((kb, r_))
                uniq.sort(key=lambda t: t[0])
                rows = [r_ for _, r_ in uniq]
        if plan.offset:
            rows = rows[plan.offset :]
        if plan.limit is not None:
            rows = rows[: plan.limit]
        return NamedRows(list(plan.head), rows)
    finally:
        tx.abort()


def db_get_handle(db, tx, name: str):
    """Handle lookup through the shared raw-validated cache."""
    from ..runtime.relation import Catalog, RelationHandle

    raw = tx.get(Catalog.meta_key(name))
    if raw is None:
        return None
    shared = db._handle_cache
    ent = shared.get(name)
    if ent is not None and ent[0] == raw:
        return ent[1]
    h = RelationHandle.from_json(raw.decode("utf-8"))
    h.is_temp = False
    shared[name] = (raw, h)
    return h
