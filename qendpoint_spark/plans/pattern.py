"""Triple-pattern access-path selection over the sorted materializations.

The reference picks the best index order per pattern mask
(BitmapTriples.search, core/triples/impl/BitmapTriples.java:303-378;
order masks core/enums/TripleComponentOrder.java:41-61): bound-subject
patterns walk the SPO structure, ?PO/??O use the FOQ/OPS index, ?P?
the predicate index (PredicateIndexArray.java:72-150). Here the
"indexes" are the SPO-, OPS- and PSO-sorted tables: choosing a table +
pushing the equality filters gives Parquet min/max row-group pruning
on the leading sort key — the same leading-component range location
rank/select provides in HDT (AdjacencyList.java), done by the columnar
reader instead.

This is the whole planner: ~20 lines, as SURVEY.md §4.1 predicted —
everything else (pushdown, pruning, codegen) is Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def choose_order(s: int | None, p: int | None, o: int | None) -> str:
    """Pattern mask -> table (sort order) choice: route to the table
    whose LEADING sort keys are bound, so the pushed filters prune
    consecutive key prefixes (TripleComponentOrder mask matching,
    core/enums/TripleComponentOrder.java:41-61 fireSearchOrderer).
    Composite masks prefer a table where BOTH bound components lead:
    S?O -> SOP (s,o are its first two keys), ?PO -> POS."""
    if s is not None and o is not None and p is None:
        return "sop"  # S?O: both bound keys lead SOP
    if s is not None:
        return "spo"  # S??, SP?, SPO: leading subject (+p second) prunes SPO
    if p is not None and o is not None:
        return "pos"  # ?PO: both bound keys lead POS
    if o is not None:
        return "ops"  # ??O: leading object prunes OPS
    if p is not None:
        return "pso"  # ?P?: leading predicate prunes PSO
    return "spo"  # ???: sequential scan; predicate_index gives stats


#: fallback chain when an alternate-order table was not materialized —
#: same behavior as the reference when an index file is absent
_FALLBACK = {"sop": "spo", "pos": "ops", "pso": "spo", "osp": "ops"}


def scan_pattern(
    spo: DataFrame,
    ops: DataFrame,
    s: int | None = None,
    p: int | None = None,
    o: int | None = None,
    pso: DataFrame | None = None,
    sop: DataFrame | None = None,
    pos: DataFrame | None = None,
    osp: DataFrame | None = None,
) -> DataFrame:
    """Return matching (s,p,o) rows using the best-sorted table.
    Without an alternate-order materialization the mask degrades to the
    nearest mandatory table (SPO/OPS) — correct, less pruned; the
    reference has the same fallback when an alternate-order index was
    not generated."""
    tables = {"spo": spo, "ops": ops, "pso": pso, "sop": sop,
              "pos": pos, "osp": osp}
    order = choose_order(s, p, o)
    if tables[order] is None:
        order = _FALLBACK[order]
    df = tables[order]
    for col, val in (("s", s), ("p", p), ("o", o)):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df.select("s", "p", "o")


# --- cardinality-driven BGP planning ------------------------------------
#
# The reference feeds per-predicate statistics into its query optimizer
# (EndpointStoreEvaluationStatisticsHDT.java:11-61) so BGP join order
# follows selectivity. Here the same stats table (encoding.indexes.
# predicate_index) drives a greedy smallest-first join order; each leaf
# is a routed scan_pattern, so leading-key pruning composes with the
# ordering.


class PatternStats:
    """Cardinality estimates from the predicate_index stats table
    (p, n_triples, n_subjects, n_objects, ...) — ≤|P| rows, collected
    once; the per-predicate dicts are what the reference keeps in its
    PredicateIndex-backed statistics object."""

    def __init__(self, predicate_stats_df):
        rows = predicate_stats_df.collect()
        self.by_p = {r["p"]: r.asDict() for r in rows}
        self.total = sum(r["n_triples"] for r in rows) or 1

    def estimate(self, s, p, o) -> float:
        """Expected matching rows for a triple pattern (None = free)."""
        if p is not None and p in self.by_p:
            st = self.by_p[p]
            n, ns, no = st["n_triples"], st["n_subjects"], st["n_objects"]
        elif p is not None:  # unknown predicate: matches nothing
            return 0.0
        else:
            n, ns, no = self.total, self.total, self.total
        card = float(n)
        if s is not None:
            card /= max(ns, 1)
        if o is not None:
            card /= max(no, 1)
        return max(card, 1e-9)


#: rows under which a BGP join side is explicitly broadcast — ~100k
#: 8-byte-ish rows is well inside any executor's memory and saves the
#: exchange on the big probe side
BGP_BROADCAST_ROWS = 100_000


def scan_bgp(
    spo,
    ops,
    patterns: list[tuple],
    stats: PatternStats | None = None,
    pso=None,
    broadcast_rows: int = BGP_BROADCAST_ROWS,
    n_shared: int | None = None,
    roles_out: dict | None = None,
) -> DataFrame:
    """Execute a basic graph pattern: each pattern is an (s, p, o)
    tuple whose elements are ints (bound) or strings (variable names).

    Join order: greedy smallest-estimated-cardinality first, never
    introducing a cartesian product while a connected pattern exists —
    the textbook selectivity-driven BGP ordering. BUILD/PROBE side:
    when stats estimate one side under `broadcast_rows`, that side is
    explicitly broadcast (the stats-driven analog of the reference
    feeding PredicateIndex counts to its join optimizer,
    EndpointStoreEvaluationStatisticsHDT.java:11-61); the accumulated
    cardinality is propagated with the textbook |A||B|/max(V(A,y),
    V(B,y)) estimate using the per-predicate distinct-subject/object
    counts as V. Returns one column per variable.

    n_shared — size of the dictionary's shared (SH) section. In the
    HDT ID scheme, subject and object IDs denote the SAME term only in
    1..n_shared (FourSectionDictionary: S-only and O-only ids both
    start at n_shared+1, so a numeric collision between them is a
    DIFFERENT pair of terms — BaseDictionary.java:120-174). A variable
    bound in subject position by one pattern and object position by
    another therefore joins on term identity only under `id <=
    n_shared`; passing n_shared enables that guard (a leading-range
    filter, so it tightens Parquet pruning too). Without it the join
    falls back to raw id equality — exact whenever the vocabulary puts
    every cross-role join term in SH (true of this repo's extraction
    grammar), but not in general.
    """

    def parts(pat):
        return {k: v for k, v in zip("spo", pat)}

    def bound(pat):
        return {k: v for k, v in parts(pat).items() if not isinstance(v, str)}

    def variables(pat):
        return {v for v in pat if isinstance(v, str)}

    _ROLE = {"s": "s", "p": "p", "o": "o"}
    var_roles: dict[str, str] = {}

    def leaf(pat):
        b = bound(pat)
        df = scan_pattern(spo, ops, pso=pso, **b)
        # a variable repeated WITHIN one pattern (e.g. ('x', 1, 'x'))
        # means equality between those components: filter, then emit
        # the variable's column ONCE (else downstream joins see a
        # duplicate column name)
        var_pos: dict[str, str] = {}
        for k, v in parts(pat).items():
            if isinstance(v, str):
                if v in var_pos:
                    df = df.filter(F.col(var_pos[v]) == F.col(k))
                    if (
                        n_shared is not None
                        and {_ROLE[k], _ROLE[var_pos[v]]} == {"s", "o"}
                    ):
                        # s==o id equality means term equality only in SH
                        df = df.filter(F.col(k) <= F.lit(n_shared))
                else:
                    var_pos[v] = k
        cols = [F.col(k).alias(v) for v, k in var_pos.items()]
        for v, k in var_pos.items():
            prev = var_roles.get(v)
            role = _ROLE[k]
            if prev is None or prev == role:
                var_roles[v] = role
            elif {prev, role} == {"s", "o"}:
                var_roles[v] = "so"  # joined across roles -> SH-only below
            else:
                raise NotImplementedError(
                    f"variable ?{v} is used in both predicate and "
                    "subject/object position; predicate IDs live in a "
                    "separate namespace — rewrite the query or join on "
                    "decoded terms"
                )
        return df.select(*cols)

    def guard_shared(df, pat):
        """Pre-filter a new leaf / the accumulated frame to the SH id
        range on every variable that is about to join across s/o
        roles."""
        if n_shared is None:
            return df
        for v in df.columns:
            if var_roles.get(v) == "so":
                df = df.filter(F.col(v) <= F.lit(n_shared))
        return df

    def var_distincts(pat) -> dict[str, float]:
        """V(var): distinct-value estimate per variable of one leaf,
        from the predicate stats (n_subjects/n_objects)."""
        if stats is None:
            return {}
        p = parts(pat)["p"]
        st = stats.by_p.get(p) if not isinstance(p, str) else None
        if st is None:
            return {}
        out = {}
        if isinstance(parts(pat)["s"], str):
            out[parts(pat)["s"]] = float(st["n_subjects"])
        if isinstance(parts(pat)["o"], str):
            out[parts(pat)["o"]] = float(st["n_objects"])
        return out

    remaining = list(patterns)
    est = (
        (lambda pat: stats.estimate(**{
            k: (None if isinstance(v, str) else v)
            for k, v in parts(pat).items()
        }))
        if stats is not None
        else (lambda pat: 3 - len(variables(pat)))
    )
    remaining.sort(key=est)
    first = remaining.pop(0)
    out = leaf(first)
    seen_vars = variables(first)
    acc_est = est(first)
    acc_v = var_distincts(first)
    while remaining:
        connected = [i for i, pat in enumerate(remaining)
                     if variables(pat) & seen_vars]
        idx = connected[0] if connected else 0
        pat = remaining.pop(idx)
        on = sorted(variables(pat) & seen_vars)
        right = leaf(pat)
        # leaf() recorded role conflicts; apply the SH guard to BOTH
        # sides before an inner join across s/o roles
        right = guard_shared(right, pat)
        out = guard_shared(out, pat)
        r_est = est(pat)
        r_v = var_distincts(pat)
        if not on:
            out = out.crossJoin(right)
            acc_est = acc_est * r_est
        else:
            # explicit build side when stats say one side is small;
            # otherwise leave the choice to Catalyst/AQE
            if stats is not None and r_est <= broadcast_rows and r_est <= acc_est:
                out = out.join(F.broadcast(right), on)
            elif stats is not None and acc_est <= broadcast_rows:
                out = right.join(F.broadcast(out), on)
            else:
                out = out.join(right, on)
            denom = max(
                [max(acc_v.get(v, 1.0), r_v.get(v, 1.0)) for v in on] or [1.0]
            )
            acc_est = acc_est * r_est / max(denom, 1.0)
        for v, d in r_v.items():
            acc_v[v] = min(acc_v.get(v, d), d)
        seen_vars |= variables(pat)
    if roles_out is not None:
        roles_out.update(var_roles)
    return out


def join_bindings(
    left: DataFrame,
    right: DataFrame,
    how: str,
    left_roles: dict | None = None,
    right_roles: dict | None = None,
    n_shared: int | None = None,
) -> DataFrame:
    """Join two variable-binding frames on their shared columns with
    HDT shared-section semantics: a variable bound in subject role on
    one side and object role on the other matches by term only when
    its id falls in the SH range (<= n_shared) — see scan_bgp. Used
    for OPTIONAL (left), MINUS (left_anti) and cross-group joins where
    pre-filtering the left side would wrongly drop rows, so the guard
    goes into the join CONDITION instead."""
    on = sorted(set(left.columns) & set(right.columns))
    if not on:
        if how == "left_anti":
            return left  # never compatible -> nothing removed
        if how == "left_semi":
            # every pair is compatible: keep left rows iff right has any
            return left.join(right, F.lit(True), "left_semi")
        if how == "left":
            # disjoint OPTIONAL: every pair is compatible; an empty
            # right side still keeps the left rows (NULL-extended)
            return left.join(right, F.lit(True), "left")
        return left.crossJoin(right)
    guard_vars = set()
    if left_roles and right_roles:
        for v in on:
            lr, rr = left_roles.get(v), right_roles.get(v)
            if lr is None or rr is None:
                continue
            if lr != rr and not ({lr, rr} <= {"s", "o", "so"}):
                raise NotImplementedError(
                    f"variable ?{v} joins role {lr!r} against {rr!r} "
                    "across groups — predicate/graph IDs are separate "
                    "namespaces"
                )
            if n_shared is not None and (lr != rr or "so" in (lr, rr)):
                guard_vars.add(v)
    if not guard_vars:
        src = right.select(*on) if how in ("left_anti", "left_semi") else right
        return left.join(src, on, how)
    renamed = right
    for v in on:
        renamed = renamed.withColumnRenamed(v, f"__r_{v}")
    cond = None
    for v in on:
        c = left[v] == renamed[f"__r_{v}"]
        if v in guard_vars:
            c = c & (left[v] <= F.lit(n_shared))
        cond = c if cond is None else (cond & c)
    joined = left.join(renamed, cond, how)
    if how in ("left_anti", "left_semi"):
        return joined
    keep = [left[c] for c in left.columns] + [
        renamed[c] for c in renamed.columns if not c.startswith("__r_")
    ]
    return joined.select(*keep)


def scan_bgp_optional(
    spo,
    ops,
    required: list[tuple],
    optional: list[tuple],
    stats: PatternStats | None = None,
    pso=None,
    n_shared: int | None = None,
) -> DataFrame:
    """SPARQL OPTIONAL: solutions of `required` left-extended by the
    `optional` group on their shared variables (unmatched rows keep
    NULL bindings — RDF4J's LeftJoin node, supplied by the RDF4J
    algebra in the reference; here it is literally Catalyst's left
    outer join, so AQE still picks broadcast/SMJ per side)."""
    req_roles: dict = {}
    opt_roles: dict = {}
    req = scan_bgp(spo, ops, required, stats=stats, pso=pso,
                   n_shared=n_shared, roles_out=req_roles)
    opt = scan_bgp(spo, ops, optional, stats=stats, pso=pso,
                   n_shared=n_shared, roles_out=opt_roles)
    return join_bindings(req, opt, "left", req_roles, opt_roles, n_shared)


def scan_bgp_minus(
    spo,
    ops,
    required: list[tuple],
    minus: list[tuple],
    stats: PatternStats | None = None,
    pso=None,
    n_shared: int | None = None,
) -> DataFrame:
    """SPARQL MINUS: drop solutions that share bindings with a match of
    the `minus` group — an anti-join on the shared variables. With no
    shared variable the groups are never compatible, so (per SPARQL
    semantics) nothing is removed."""
    req_roles: dict = {}
    m_roles: dict = {}
    req = scan_bgp(spo, ops, required, stats=stats, pso=pso,
                   n_shared=n_shared, roles_out=req_roles)
    m = scan_bgp(spo, ops, minus, stats=stats, pso=pso,
                 n_shared=n_shared, roles_out=m_roles)
    return join_bindings(req, m, "left_anti", req_roles, m_roles, n_shared)
