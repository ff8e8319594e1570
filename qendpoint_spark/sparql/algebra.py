"""SPARQL algebra -> DataFrame compiler over the encoded HDT-style tables.

The reference evaluates SPARQL by handing RDF4J's algebra tree an
HDT-backed triple source plus per-predicate statistics
(EndpointStore / EndpointStoreEvaluationStatisticsHDT.java). Here the
same split is Spark-native: `parser.parse_query` produces the algebra,
and this module compiles it onto the routed pattern/path planners
(plans.pattern, plans.paths) so Catalyst plans the joins. Bindings are
carried as dictionary IDs (longs) end to end — lexical term strings
materialize only where a FILTER / BIND / projection needs a value
(late materialization, the reference's ID->Value bridging).

Supported subset (documented, raising loudly outside it):
  SELECT / ASK / CONSTRUCT / DESCRIBE; BGPs with `;`/`,`/`a`; property
  paths `/ | ^ + * {1,n}`; OPTIONAL / MINUS / UNION / VALUES / BIND /
  subqueries (`{ SELECT ... }`) / GRAPH (over a quads table) / FILTER
  (comparisons, && || !, arithmetic, [NOT] EXISTS, REGEX/STR/LANG/
  DATATYPE/BOUND/STRSTARTS/STRENDS/CONTAINS/STRLEN/UCASE/LCASE/ABS/
  COALESCE/IF/isIRI/isLiteral/isBlank/sameTerm); GROUP BY + COUNT/SUM/
  AVG/MIN/MAX/SAMPLE/GROUP_CONCAT + HAVING; DISTINCT; ORDER BY;
  LIMIT/OFFSET. Not supported: SERVICE, UNDEF in VALUES, aggregate
  expressions over computed args, paths/nested groups inside GRAPH.

ID-space correctness: a variable joining subject- against object-role
bindings is clamped to the shared section (id <= n_shared) — see
plans.pattern.scan_bgp. A variable joining predicate- against
subject/object-role bindings falls back to joining on decoded term
strings (predicate IDs are their own namespace).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qendpoint_spark.dictionary.builder import (
    object_map,
    predicate_map,
    subject_map,
)
from qendpoint_spark.plans import (
    PatternStats,
    join_bindings,
    path_alt,
    path_inverse,
    path_seq,
    path_step,
    path_zero_or_more,
    scan_bgp,
    transitive_closure,
)
from qendpoint_spark.sparql.parser import (
    Aggregate,
    BinOp,
    BindClause,
    ExistsExpr,
    FilterClause,
    FuncCall,
    GraphGroup,
    GroupGraphPattern,
    MinusGroup,
    NumLit,
    OptionalGroup,
    PathAlt,
    PathInv,
    PathNeg,
    PathPred,
    PathRepeat,
    PathSeq,
    ProjExpr,
    Query,
    StrLit,
    SubSelect,
    Term,
    TriplePattern,
    UnaryOp,
    UnionGroup,
    ValuesClause,
    Var,
    parse_query,
)

#: binding-column kinds: which ID space (or value form) a variable's
#: column holds. 's'/'o'/'p'/'g' = that role's dictionary id; 'so' =
#: joined across subject/object roles (known SH); 'term' = lexical
#: term string; 'val' = computed plain value (BIND / aggregate).
_ID_KINDS = ("s", "o", "p", "so", "g")

# extracts the lexical value of a literal: group 1 of `"<value>"` with
# an optional @lang / ^^<dt> suffix; (?s) so embedded newlines match
_LIT_VALUE_RE = r'(?s)^"(.*)"(@[A-Za-z0-9-]+|\^\^<[^>]*>)?$'


@dataclass
class _BFrame:
    df: DataFrame
    kinds: dict  # var name -> kind
    # variables whose column MAY hold NULL (bound only inside an
    # OPTIONAL, or padded by a UNION branch) — joins on these need
    # SPARQL compatibility semantics, not plain equality
    maybe_null: set = field(default_factory=set)


def _is_true(bf: _BFrame) -> bool:
    return bool(bf.df.take(1))


def _collect_expr_aggs(node, out: dict) -> None:
    """Find Aggregate leaves inside a projection/HAVING expression and
    assign each distinct one a synthetic output alias (value-equal
    aggregates share a column — Aggregate is a frozen dataclass)."""
    if isinstance(node, Aggregate):
        out.setdefault(node, f"__pagg_{len(out)}")
    elif isinstance(node, BinOp):
        _collect_expr_aggs(node.left, out)
        _collect_expr_aggs(node.right, out)
    elif isinstance(node, UnaryOp):
        _collect_expr_aggs(node.operand, out)
    elif isinstance(node, FuncCall):
        for a in node.args:
            _collect_expr_aggs(a, out)


def _replace_expr_aggs(node, mapping: dict):
    """Rewrite Aggregate leaves to Vars referencing their aggregated
    columns, so the outer expression compiles over the grouped frame."""
    if isinstance(node, Aggregate):
        return Var(mapping[node])
    if isinstance(node, BinOp):
        return BinOp(
            node.op,
            _replace_expr_aggs(node.left, mapping),
            _replace_expr_aggs(node.right, mapping),
        )
    if isinstance(node, UnaryOp):
        return UnaryOp(node.op, _replace_expr_aggs(node.operand, mapping))
    if isinstance(node, FuncCall):
        return FuncCall(
            node.name,
            tuple(_replace_expr_aggs(a, mapping) for a in node.args),
        )
    return node


def _ast_vars(node) -> set[str]:
    """Every Var name mentioned anywhere under a parser AST node
    (generic dataclass walk) — used to decide whether deferred VALUES
    bindings are observed by a following MINUS/BIND."""
    import dataclasses

    out: set[str] = set()
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, Var):
            out.add(n.name)
        elif dataclasses.is_dataclass(n) and not isinstance(n, type):
            stack.extend(
                getattr(n, f.name) for f in dataclasses.fields(n)
            )
        elif isinstance(n, (list, tuple)):
            stack.extend(n)
    return out


def _const_lex(x) -> str:
    """Lexical form of a constant path endpoint (Term or NumLit)."""
    t = x.as_term() if isinstance(x, NumLit) else x
    return t.lex


def _normalize_nps(node):
    """Apply the SPARQL 1.1 §9.1 negated-property-set decomposition
    NPS(P ∪ ^Q) = NPS(P) | ^NPS(Q) everywhere in a path tree, so every
    remaining PathNeg is single-direction (one scan, one ID space)."""
    if isinstance(node, PathNeg) and node.fwd and node.bwd:
        return PathAlt((PathNeg(node.fwd, ()), PathInv(PathNeg(node.bwd, ()))))
    if isinstance(node, PathInv):
        return PathInv(_normalize_nps(node.inner))
    if isinstance(node, PathSeq):
        return PathSeq(tuple(_normalize_nps(s) for s in node.steps))
    if isinstance(node, PathAlt):
        return PathAlt(tuple(_normalize_nps(a) for a in node.alts))
    if isinstance(node, PathRepeat):
        return PathRepeat(
            _normalize_nps(node.inner), node.min_hops, node.max_hops
        )
    return node


def _path_roles(node):
    """(src_role, dst_role) the ID-space compile would produce, or
    None when some alternative binds conflicting spaces (e.g. p|^p) —
    those cannot union as raw ids and must decompose (pattern-level
    UNION) or decode (term-space closure). Mixed NPS must already be
    normalized away (`_normalize_nps`)."""
    if isinstance(node, PathPred):
        return ("s", "o")
    if isinstance(node, PathNeg):
        return ("s", "o") if node.fwd else ("o", "s")
    if isinstance(node, PathInv):
        r = _path_roles(node.inner)
        return None if r is None else (r[1], r[0])
    if isinstance(node, PathSeq):
        rs = [_path_roles(s) for s in node.steps]
        if any(r is None for r in rs):
            return None
        return (rs[0][0], rs[-1][1])
    if isinstance(node, PathAlt):
        rs = [_path_roles(a) for a in node.alts]
        if any(r is None for r in rs) or len(set(rs)) > 1:
            return None
        return rs[0]
    if isinstance(node, PathRepeat):
        return _path_roles(node.inner)
    return None


def _distribute_alts(node) -> list:
    """Lift alternatives to the top of a path tree:
    `(a|b)/c -> a/c | b/c`, `^(a|b) -> ^a|^b`. PathRepeat is atomic —
    `(a|b)+` is NOT `a+|b+` (the closure interleaves branches), so
    alternatives stay inside it and its conflicts resolve in term
    space instead. Query paths are tiny, so the product is bounded."""
    if isinstance(node, PathAlt):
        return [b for a in node.alts for b in _distribute_alts(a)]
    if isinstance(node, PathInv):
        return [PathInv(b) for b in _distribute_alts(node.inner)]
    if isinstance(node, PathSeq):
        from itertools import product as _product

        lists = [_distribute_alts(s) for s in node.steps]
        return [PathSeq(tuple(c)) for c in _product(*lists)]
    return [node]


class SparqlEngine:
    """Execute SPARQL strings against one encoded dataset.

    Parameters mirror what the rest of the repo materializes: the
    encoded (s,p,o) table (or prebuilt spo/ops sorted tables), the
    dictionary, optionally the PSO table and PatternStats for routed
    scans and stats-driven BGP ordering.
    """

    def __init__(
        self,
        enc: DataFrame | None = None,
        dict_terms: DataFrame | None = None,
        *,
        spo: DataFrame | None = None,
        ops: DataFrame | None = None,
        pso: DataFrame | None = None,
        stats: PatternStats | None = None,
        quads: DataFrame | None = None,
    ):
        if dict_terms is None:
            raise ValueError("SparqlEngine requires dict_terms")
        from qendpoint_spark.encoding import ops_table, spo_table

        if spo is None or ops is None:
            if enc is None:
                raise ValueError("pass enc or prebuilt spo+ops tables")
            spo = spo_table(enc)
            ops = ops_table(enc)
        self.spo = spo
        self.ops = ops
        self.pso = pso
        self.stats = stats
        self.quads = quads  # encoded (s,p,o,g) for GRAPH patterns
        self.dict_terms = dict_terms
        self._n_shared: int | None = None
        self._maps: dict[str, DataFrame] = {}
        self._consts: dict[tuple[str, str], int] = {}

    @classmethod
    def from_catalog(cls, catalog) -> "SparqlEngine":
        """Build an engine over a published pipeline warehouse — the
        analog of pointing the reference's `hdtsparql` CLI at an .hdt
        file (qendpoint-cli/bin/hdtsparql.sh). Uses every access path
        the pipeline materialized: SPO/OPS always, PSO and the
        predicate-stats table when present."""
        import os

        pso = None
        if os.path.exists(catalog.table_path("triples_pso")):
            pso = catalog.read("triples_pso")
        stats = None
        if os.path.exists(catalog.table_path("predicate_index")):
            stats = PatternStats(catalog.read("predicate_index"))
        quads = None
        if os.path.exists(catalog.table_path("quads_spog")):
            quads = catalog.read("quads_spog")
        return cls(
            dict_terms=catalog.read("dict_terms"),
            spo=catalog.read("triples_spo"),
            ops=catalog.read("triples_ops"),
            pso=pso,
            stats=stats,
            quads=quads,
        )

    # -- dictionary access ----------------------------------------------

    @property
    def n_shared(self) -> int:
        if self._n_shared is None:
            self._n_shared = int(
                self.dict_terms.filter(F.col("section") == "SH").count()
            )
        return self._n_shared

    def _role_map(self, kind: str) -> DataFrame:
        """(term, id) for one ID space; SH ids are valid in both the
        subject and object maps (same id, same term)."""
        role = "s" if kind == "so" else kind
        if role not in self._maps:
            if role == "s":
                m = subject_map(self.dict_terms).select(
                    "term", F.col("sid").alias("id")
                )
            elif role == "o":
                m = object_map(self.dict_terms).select(
                    "term", F.col("oid").alias("id")
                )
            elif role == "p":
                m = predicate_map(self.dict_terms).select(
                    "term", F.col("pid").alias("id")
                )
            elif role == "g":
                from qendpoint_spark.dictionary.builder import graph_map

                m = graph_map(self.dict_terms).select(
                    "term", F.col("gid").alias("id")
                )
            else:
                raise ValueError(f"no dictionary map for kind {kind!r}")
            self._maps[role] = m
        return self._maps[role]

    def _prefetch_consts(self, pairs: set[tuple[str, str]]) -> None:
        """Resolve all (role, lexical) constants of a query in at most
        one bounded collect per role — the engine-side analog of a
        SPARQL engine looking up the query's constant terms in the
        dictionary before evaluation."""
        by_role: dict[str, list[str]] = {}
        for role, lex in pairs:
            if (role, lex) not in self._consts:
                by_role.setdefault("s" if role == "so" else role, []).append(lex)
        for role, terms in by_role.items():
            rows = (
                self._role_map(role)
                .filter(F.col("term").isin(terms))
                .collect()
            )
            found = {r["term"]: int(r["id"]) for r in rows}
            for lex in terms:
                # -1 is outside every ID space: an absent term makes
                # its pattern match nothing, exactly like the reference
                # returning empty iterators for unknown dictionary ids
                self._consts[(role, lex)] = found.get(lex, -1)

    def _const_id(self, role: str, lex: str) -> int:
        key = ("s" if role == "so" else role, lex)
        if key not in self._consts:
            self._prefetch_consts({key})
        return self._consts[key]

    # -- public API ------------------------------------------------------

    def query(self, text: str) -> DataFrame:
        return self.execute(parse_query(text))

    def execute(self, q: Query) -> DataFrame:
        self._prefetch_consts(_collect_consts(q))
        if q.from_graphs or q.from_named:
            return self._scoped_engine(q).execute(
                _strip_dataset(q)
            )
        if q.form == "DESCRIBE":
            return self._describe(q)
        bf = self._compile_group(q.where)
        if q.form == "ASK":
            spark = self.spo.sparkSession
            return spark.range(1).select(F.lit(_is_true(bf)).alias("ask"))
        if q.form == "CONSTRUCT":
            return self._construct(bf, q)
        return self._select(bf, q)

    def _scoped_engine(self, q: Query) -> "SparqlEngine":
        """Dataset clauses (FROM / FROM NAMED): a shallow engine copy
        whose default graph is the union of the FROM graphs' triples
        and whose GRAPH patterns range only over the FROM NAMED set —
        the SPARQL 1.1 dataset construction, done as quad-table
        filters (gid IN (...) pushes to the scan)."""
        import copy

        if self.quads is None:
            raise NotImplementedError(
                "FROM / FROM NAMED need a quads table"
            )
        scoped = copy.copy(self)
        if q.from_graphs:
            ids = [self._const_id("g", t.lex) for t in q.from_graphs]
            tri = (
                self.quads.filter(F.col("g").isin(ids))
                .select("s", "p", "o")
                .dropDuplicates(["s", "p", "o"])
            )
            scoped.spo = tri
            scoped.ops = tri
            scoped.pso = None
            scoped.stats = None  # stats describe the full dataset
        if q.from_named:
            ids = [self._const_id("g", t.lex) for t in q.from_named]
            scoped.quads = self.quads.filter(F.col("g").isin(ids))
        elif q.from_graphs:
            # FROM without FROM NAMED: the named-graph set is empty
            scoped.quads = self.quads.filter(F.lit(False))
        return scoped

    def _describe(self, q: Query) -> DataFrame:
        """DESCRIBE: every triple whose subject or object is one of the
        described resources (symmetric concise description — the spec
        leaves the exact shape to the implementation; RDF4J, which the
        reference delegates to, returns the resource's incident
        triples). Resources = the listed IRIs plus the bindings of the
        listed variables from WHERE. All set logic stays in ID space:
        term -> sid/oid maps, semi-joins against SPO/OPS, decode last."""
        from qendpoint_spark.encoding import decode_triples

        iri_terms = [r.lex for r in q.projection if isinstance(r, Term)]
        var_names = [r.name for r in q.projection if isinstance(r, Var)]
        spark = self.spo.sparkSession
        frames = []
        if iri_terms:
            frames.append(
                spark.createDataFrame(
                    [(t,) for t in iri_terms], "term string"
                )
            )
        if var_names:
            bf = self._compile_group(q.where)
            for v in var_names:
                self._to_term(bf, v)
                frames.append(
                    bf.df.select(F.col(v).alias("term")).where(
                        F.col(v).isNotNull()
                    )
                )
        if not frames:
            raise ValueError("DESCRIBE with no resources")
        res = frames[0]
        for f in frames[1:]:
            res = res.unionByName(f)
        res = res.distinct()
        smap = self._role_map("s")
        omap = self._role_map("o")
        sids = res.join(smap, "term").select(F.col("id").alias("s"))
        oids = res.join(omap, "term").select(F.col("id").alias("o"))
        by_s = self.spo.join(sids, "s", "left_semi")
        by_o = self.ops.select("s", "p", "o").join(oids, "o", "left_semi")
        hits = by_s.unionByName(by_o).dropDuplicates(["s", "p", "o"])
        return decode_triples(hits, self.dict_terms)

    # -- group graph patterns -------------------------------------------

    def _compile_group(self, ggp: GroupGraphPattern) -> _BFrame:
        acc: _BFrame | None = None
        pending: list[tuple] = []
        filters: list = []
        values: list[ValuesClause] = []
        bn = [0]

        def seed_values(el_vars: set[str]) -> None:
            """Spec 18.2.2.6 joins VALUES at its syntactic position;
            the engine defers it to end-of-group so pattern-bound vars
            resolve ID spaces first. That is sound only while no
            intervening operator OBSERVES the VALUES bindings. MINUS
            and BIND do: a VALUES-first group followed by either one
            must see the inline data as the current solution sequence
            (otherwise '{ VALUES ?a {<e1>} MINUS { ?a <n> ?b } }'
            keeps e1 and '{ VALUES ?x {1 2} BIND(?x+1 AS ?y) }' yields
            NULL — ADVICE r6 high, both silent wrong answers). So:
            with no pattern bindings yet (acc is None), join the
            deferred VALUES now (term-level vars; _join decodes an
            ID-space operand to terms as needed). With patterns
            already in acc AND shared variables, an early join could
            term/ID-mismatch a LATER pattern binding — that case stays
            loud rather than silently wrong."""
            nonlocal acc
            if not values:
                return
            vvars = {v.name for vc in values for v in vc.variables}
            if acc is not None:
                if vvars & el_vars:
                    raise NotImplementedError(
                        "VALUES sharing variables with a following "
                        "MINUS/BIND in a group that also contains "
                        "patterns; rewrite with a subquery"
                    )
                return
            acc = self._unit_frame()
            for vc in values:
                acc = self._join(acc, self._values_frame(vc, acc), "inner")
            values.clear()

        def conv(x, role: str):
            """Pattern position -> scan_bgp element (var name or id).
            A blank node in the query is a non-distinguished variable
            (SPARQL 1.1 §4.1.4), not a term lookup."""
            if isinstance(x, Var):
                return x.name
            if isinstance(x, NumLit):
                x = x.as_term()
            if x.lex.startswith("_:"):
                return f"__bn_{x.lex[2:]}"
            return self._const_id(role, x.lex)

        def flush():
            nonlocal acc, pending
            if not pending:
                return
            # a variable used in predicate position by one pattern and
            # subject/object position by another cannot join in ID
            # space (separate namespaces): run those patterns as
            # separate scans so _join reconciles them on decoded terms
            pred_vars = {p[1] for p in pending if isinstance(p[1], str)}
            so_vars = {
                v
                for p in pending
                for v in (p[0], p[2])
                if isinstance(v, str)
            }
            conflicted = pred_vars & so_vars
            batches: list[list[tuple]]
            if conflicted:
                batches = [[p] for p in pending]
            else:
                batches = [pending]
            pending = []
            for batch in batches:
                roles: dict = {}
                df = scan_bgp(
                    self.spo,
                    self.ops,
                    batch,
                    stats=self.stats,
                    pso=self.pso,
                    n_shared=self.n_shared,
                    roles_out=roles,
                )
                bf = _BFrame(df, dict(roles))
                acc = bf if acc is None else self._join(acc, bf, "inner")

        for el in ggp.elements:
            if isinstance(el, TriplePattern):
                if isinstance(el.p, (Term, Var)):
                    pending.append(
                        (conv(el.s, "s"), conv(el.p, "p"), conv(el.o, "o"))
                    )
                else:
                    flush()
                    bf = self._compile_path_pattern(el, bn)
                    acc = bf if acc is None else self._join(acc, bf, "inner")
            elif isinstance(el, FilterClause):
                filters.append(el.expr)
            elif isinstance(el, OptionalGroup):
                flush()
                sub = self._compile_group(el.group)
                acc = sub if acc is None else self._join(acc, sub, "left")
            elif isinstance(el, MinusGroup):
                flush()
                seed_values(_ast_vars(el.group))
                sub = self._compile_group(el.group)
                if acc is None:
                    # Minus(unit, B): the empty solution shares no
                    # variable with any B row, so nothing is removed
                    acc = self._unit_frame()
                acc = self._join(acc, sub, "left_anti")
            elif isinstance(el, UnionGroup):
                flush()
                sub = self._union(
                    [self._compile_group(b) for b in el.branches]
                )
                acc = sub if acc is None else self._join(acc, sub, "inner")
            elif isinstance(el, BindClause):
                flush()
                seed_values(_ast_vars(el.expr))
                if acc is None:
                    acc = self._unit_frame()
                if el.var.name in acc.kinds:
                    raise ValueError(f"BIND rebinds ?{el.var.name}")
                col, _ = self._expr(el.expr, acc)
                acc.df = acc.df.withColumn(el.var.name, col)
                acc.kinds[el.var.name] = "val"
            elif isinstance(el, SubSelect):
                flush()
                sub = self._subframe(el.query)
                acc = sub if acc is None else self._join(acc, sub, "inner")
            elif isinstance(el, GraphGroup):
                flush()
                sub = self._compile_graph_group(el)
                acc = sub if acc is None else self._join(acc, sub, "inner")
            elif isinstance(el, ValuesClause):
                values.append(el)
            else:
                raise NotImplementedError(f"unsupported element {el!r}")
        flush()
        if acc is None:
            if not values:
                raise NotImplementedError("empty group graph pattern")
            # VALUES-only group: inline data IS the solution sequence
            # (spec 18.2.2.6 joins it with the unit pattern)
            acc = self._unit_frame()
        for vc in values:
            acc = self._join(acc, self._values_frame(vc, acc), "inner")
        for expr in filters:
            if isinstance(expr, ExistsExpr):
                acc = self._apply_exists(
                    acc, self._compile_group(expr.group), expr.negated
                )
                continue
            col, _ = self._expr(expr, acc)
            acc.df = acc.df.filter(col.cast("boolean"))
        acc.df = _drop_aux(acc.df)
        return acc

    def _apply_exists(
        self, acc: _BFrame, sub: _BFrame, negated: bool
    ) -> _BFrame:
        """FILTER [NOT] EXISTS as a semi/anti join on the shared
        variables (exact for BGP-shaped subgroups — the correlated
        evaluation the SPARQL spec describes reduces to this join).
        With no shared variable the subgroup's truth is global: keep
        everything or nothing — NOT the MINUS no-shared-vars rule,
        which is exactly how the two operators differ."""
        on = set(acc.kinds) & set(sub.kinds)
        if not on:
            if negated == _is_true(sub):
                return _BFrame(acc.df.limit(0), acc.kinds)
            return acc
        return self._join(
            acc, sub, "left_anti" if negated else "left_semi", exists=True
        )

    # GRAPH ?g { <complex body> } evaluates the body once per named
    # graph; above this many graphs the plan (a Catalyst union of that
    # many subtrees) stops being reasonable and we fail loudly. Plain
    # BGP+FILTER bodies never enumerate — they thread ?g through the
    # quad scan and scale to any graph count.
    max_graph_enum = 64

    def _graph_scoped(self, gid: int) -> "SparqlEngine":
        """Shallow engine copy whose default graph is one named graph:
        spo/ops become the gid-filtered quad scan (the filter pushes to
        the parquet scan), dataset-wide stats/pso are dropped. The
        named-graph set (self.quads) is kept — a GRAPH nested inside a
        GRAPH ranges over the dataset's graphs, not the outer one."""
        import copy

        scoped = copy.copy(self)
        tri = (
            self.quads.filter(F.col("g") == F.lit(gid))
            .select("s", "p", "o")
        )
        scoped.spo = tri
        scoped.ops = tri
        scoped.pso = None
        scoped.stats = None
        return scoped

    def _compile_graph_group(self, gg: GraphGroup) -> _BFrame:
        """GRAPH (iri|var) { group } over the encoded quads table.

        Plain bodies (triple patterns + FILTER) thread the graph
        component through each quad scan: bound (const gid) or
        projected (?g, kind 'g' — its own ID namespace, decoded via
        the broadcast G section); leaves join through the same
        role-guarded _join as everything else, at any graph count.

        Complex bodies (property paths, OPTIONAL/MINUS/UNION, nested
        groups, BIND, subselects) compile through the ENTIRE group
        machinery on a graph-scoped engine (`_graph_scoped`): for a
        constant graph that is one pushed-down gid filter; for a graph
        variable the body runs once per named graph (G section) and
        the branches union, guarded by `max_graph_enum`. Reference
        anchor: RDF4J evaluates these via its dataset-aware
        StatementPattern scoping (qendpoint-store ComplianceTest.java
        pins the W3C semantics)."""
        if self.quads is None:
            raise NotImplementedError(
                "GRAPH patterns need a quads table: "
                "SparqlEngine(..., quads=encoded_spog)"
            )
        simple = all(
            isinstance(el, FilterClause)
            or (
                isinstance(el, TriplePattern)
                and isinstance(el.p, (Term, Var))
            )
            for el in gg.group.elements
        )
        if not simple:
            if isinstance(gg.graph, Term):
                gid = self._const_id("g", gg.graph.lex)
                return self._graph_scoped(gid)._compile_group(gg.group)
            from qendpoint_spark.dictionary.builder import graph_map

            gids = [
                int(r["gid"])
                for r in graph_map(self.dict_terms)
                .select("gid")
                .collect()
            ]
            if len(gids) > self.max_graph_enum:
                raise NotImplementedError(
                    f"GRAPH ?{gg.graph.name} over a complex body "
                    f"enumerates named graphs; {len(gids)} graphs "
                    f"exceed max_graph_enum={self.max_graph_enum}. "
                    "Raise engine.max_graph_enum, or rewrite the body "
                    "as plain triple patterns (which scale to any "
                    "graph count)."
                )
            if not gids:
                bf = self._graph_scoped(-1)._compile_group(gg.group)
                bf.df = bf.df.withColumn(
                    gg.graph.name, F.lit(None).cast("long")
                ).limit(0)
                bf.kinds[gg.graph.name] = "g"
                return bf
            branches = []
            for gid in sorted(gids):
                bf = self._graph_scoped(gid)._compile_group(gg.group)
                gname = gg.graph.name
                if gname in bf.kinds:
                    raise ValueError(
                        f"GRAPH variable ?{gname} rebound inside body"
                    )
                bf.df = bf.df.withColumn(gname, F.lit(gid))
                bf.kinds[gname] = "g"
                branches.append(bf)
            return self._union(branches)
        acc: _BFrame | None = None
        filters = []
        for el in gg.group.elements:
            if isinstance(el, FilterClause):
                filters.append(el.expr)
                continue
            df = self.quads
            kinds: dict = {}
            var_pos: dict[str, str] = {}
            for col, x, role in (
                ("s", el.s, "s"),
                ("p", el.p, "p"),
                ("o", el.o, "o"),
                ("g", gg.graph, "g"),
            ):
                if isinstance(x, Var):
                    name = x.name
                elif isinstance(x, Term) and x.lex.startswith("_:"):
                    name = f"__bn_{x.lex[2:]}"
                else:
                    t = x.as_term() if isinstance(x, NumLit) else x
                    df = df.filter(
                        F.col(col) == F.lit(self._const_id(role, t.lex))
                    )
                    continue
                if name in var_pos:
                    cond = F.col(var_pos[name]) == F.col(col)
                    prev_role = kinds[name]
                    if {prev_role, role} == {"s", "o"}:
                        cond = cond & (F.col(col) <= F.lit(self.n_shared))
                        kinds[name] = "so"
                    elif prev_role != role:
                        raise NotImplementedError(
                            f"?{name} repeats across {prev_role}/{role} "
                            "roles within one quad pattern"
                        )
                    df = df.filter(cond)
                else:
                    var_pos[name] = col
                    kinds.setdefault(name, role)
            df = df.select(
                *[F.col(c).alias(v) for v, c in var_pos.items()]
            )
            bf = _BFrame(df, kinds)
            acc = bf if acc is None else self._join(acc, bf, "inner")
        if acc is None:
            raise NotImplementedError("empty GRAPH group")
        for expr in filters:
            col, _ = self._expr(expr, acc)
            acc.df = acc.df.filter(col.cast("boolean"))
        acc.df = _drop_aux(acc.df)
        return acc

    def _union(self, branches: list[_BFrame]) -> _BFrame:
        """UNION: concatenate solution sets, padding absent variables
        with NULL. Branches that bind a variable in incompatible ID
        spaces are reconciled by decoding that variable to term
        strings first (rare; keeps term identity exact). An 'so'
        binding unions losslessly with 's' or 'o' — SH ids carry the
        same value in both maps."""

        def merge_kind(k1: str, k2: str) -> str:
            if k1 == k2:
                return k1
            if {k1, k2} == {"s", "so"}:
                return "s"
            if {k1, k2} == {"o", "so"}:
                return "o"
            return "term"

        kinds: dict = {}
        for b in branches:
            for v, k in b.kinds.items():
                kinds[v] = merge_kind(kinds[v], k) if v in kinds else k
        for b in branches:
            for v, k in list(b.kinds.items()):
                if kinds[v] == "term" and k != "term":
                    self._to_term(b, v)
        out = None
        for b in branches:
            df = _drop_aux(b.df)
            for v in kinds:
                if v not in b.kinds:
                    df = df.withColumn(
                        v,
                        F.lit(None).cast(
                            "long" if kinds[v] in _ID_KINDS else "string"
                        ),
                    )
            df = df.select(*sorted(kinds))
            out = df if out is None else out.unionByName(df)
        mn = set().union(*(b.maybe_null for b in branches))
        for v in kinds:  # a var absent from any branch is NULL there
            if any(v not in b.kinds for b in branches):
                mn.add(v)
        return _BFrame(out, kinds, {v for v in mn if v in kinds})

    def _unit_frame(self) -> _BFrame:
        """The unit solution (one row, no bindings) — the identity of
        Join, so a group may legally start with BIND / MINUS or hold
        only VALUES (spec 18.2.2.6 translates them over the empty
        pattern). The seed column is __aux so joins drop it."""
        spark = self.spo.sparkSession
        return _BFrame(
            spark.range(1).select(F.lit(1).alias("__aux_unit")), {}
        )

    def _values_frame(self, vc: ValuesClause, acc: _BFrame) -> _BFrame:
        """Inline data: resolve each term in the ID space its variable
        is bound in (known by now from the group's patterns)."""
        spark = self.spo.sparkSession
        names = [v.name for v in vc.variables]
        kinds = {}
        for n in names:
            # a var no pattern binds stays term-level: its data need
            # not exist in any ID space (e.g. VALUES-only groups)
            k = acc.kinds.get(n, "term")
            if k in ("term", "val"):
                k = "term"
            kinds[n] = "so" if k == "so" else k
        rows = []
        undef_vars: set[str] = set()
        for row in vc.rows:
            out_row = []
            for n, cell in zip(names, row):
                if cell is None:  # UNDEF: this var unconstrained here
                    undef_vars.add(n)
                    out_row.append(None)
                    continue
                t = cell.as_term() if isinstance(cell, NumLit) else cell
                if kinds[n] == "term":
                    out_row.append(t.lex)
                else:
                    out_row.append(self._const_id(kinds[n], t.lex))
            rows.append(tuple(out_row))
        schema = ", ".join(
            f"{n} {'string' if kinds[n] == 'term' else 'long'}" for n in names
        )
        return _BFrame(spark.createDataFrame(rows, schema), kinds, undef_vars)

    # -- property paths --------------------------------------------------

    def _compile_path(self, node) -> tuple[DataFrame, str, str]:
        """Compile a path expression to (edges(src,dst), src_role,
        dst_role). Roles track which ID space each endpoint column
        holds: a plain step binds (subject, object) ids; inverse swaps
        them; composition propagates them. The seq/closure middle join
        is clamped to the shared section ONLY when it joins differing
        roles — e.g. `p/^p` joins object ids against object ids and
        must NOT be clamped."""
        if isinstance(node, PathPred):
            return (
                path_step(
                    self.spo, self.ops, p=self._const_id("p", node.iri),
                    pso=self.pso,
                ),
                "s",
                "o",
            )
        if isinstance(node, PathNeg):
            # filtered statement scan: all edges except the named
            # predicates. The exclusion list is tiny (query text), so
            # NOT IN folds into the scan filter — no join. Absent
            # predicates resolve to -1 which excludes nothing.
            if node.fwd and node.bwd:
                # unreachable from queries: _compile_path_pattern
                # normalizes mixed NPS away first (_normalize_nps)
                raise AssertionError(
                    "mixed NPS must be normalized before ID-space "
                    "compile (see _normalize_nps)"
                )
            if node.fwd:
                ids = [self._const_id("p", iri) for iri in node.fwd]
                edges = self.spo.filter(~F.col("p").isin(ids))
                return (
                    edges.select(
                        F.col("s").alias("src"), F.col("o").alias("dst")
                    ),
                    "s",
                    "o",
                )
            ids = [self._const_id("p", iri) for iri in node.bwd]
            edges = self.ops.select("s", "p", "o").filter(
                ~F.col("p").isin(ids)
            )
            return (
                edges.select(
                    F.col("o").alias("src"), F.col("s").alias("dst")
                ),
                "o",
                "s",
            )
        if isinstance(node, PathInv):
            df, sr, dr = self._compile_path(node.inner)
            return path_inverse(df), dr, sr
        if isinstance(node, PathSeq):
            out, sr, dr = self._compile_path(node.steps[0])
            for step in node.steps[1:]:
                nxt, nsr, ndr = self._compile_path(step)
                clamp = self.n_shared if dr != nsr else None
                out = path_seq(out, nxt, n_shared=clamp)
                dr = ndr
            return out, sr, dr
        if isinstance(node, PathAlt):
            parts = [self._compile_path(a) for a in node.alts]
            roles = {(sr, dr) for _, sr, dr in parts}
            if len(roles) > 1:
                # unreachable from queries: _compile_path_pattern
                # decomposes mixed-role alternatives to pattern-level
                # unions (or term space, inside closures) first
                raise AssertionError(
                    "mixed-role PathAlt must decompose before ID-space "
                    "compile (see _compile_path_pattern)"
                )
            sr, dr = parts[0][1], parts[0][2]
            return path_alt(*(df for df, _, _ in parts)), sr, dr
        if isinstance(node, PathRepeat):
            inner, sr, dr = self._compile_path(node.inner)
            if node.min_hops != 1:
                raise NotImplementedError(
                    f"path repetition with min={node.min_hops} must be "
                    "handled at the pattern level (see "
                    "_compile_path_pattern)"
                )
            clamp = self.n_shared if dr != sr else None
            return (
                transitive_closure(
                    inner, max_hops=node.max_hops, n_shared=clamp
                ),
                sr,
                dr,
            )
        raise NotImplementedError(f"unsupported path node {node!r}")

    def _edges_to_terms(
        self, edges: DataFrame, src_role: str, dst_role: str
    ) -> DataFrame:
        """Decode an ID-space (src, dst) edge frame to lexical terms —
        two equi-joins against the role maps. Only the term-space path
        fallback pays this: the maps are dataset-sized, so the joins
        are full sort-merge shuffles (∝ edges, never quadratic)."""
        ms = self._role_map(src_role).select(
            F.col("id").alias("__ei"), F.col("term").alias("__et")
        )
        edges = (
            edges.join(ms, edges["src"] == ms["__ei"])
            .select(F.col("__et").alias("src"), F.col("dst"))
        )
        md = self._role_map(dst_role).select(
            F.col("id").alias("__ei"), F.col("term").alias("__et")
        )
        return (
            edges.join(md, edges["dst"] == md["__ei"])
            .select("src", F.col("__et").alias("dst"))
        )

    def _compile_path_terms(self, node) -> DataFrame:
        """Compile a path whose alternatives bind conflicting ID
        spaces to a (src, dst) edge frame of LEXICAL TERMS. Reached
        only for closures over mixed-role edge sets — `(p|^p)+` et
        al., the undirected-reachability idiom — which cannot
        decompose into per-branch ID-space unions. Term strings are
        globally unique (one dictionary), so seq joins and closures
        need no shared-section clamp; the cost is the decode join per
        leaf (see _edges_to_terms). RDF4J evaluates the same shape via
        PathIteration over materialized Values, i.e. also term-level."""
        if _path_roles(node) is not None:
            return self._edges_to_terms(*self._compile_path(node))
        if isinstance(node, PathAlt):
            return path_alt(
                *(self._compile_path_terms(a) for a in node.alts)
            )
        if isinstance(node, PathInv):
            return path_inverse(self._compile_path_terms(node.inner))
        if isinstance(node, PathSeq):
            out = self._compile_path_terms(node.steps[0])
            for step in node.steps[1:]:
                out = path_seq(out, self._compile_path_terms(step))
            return out
        if isinstance(node, PathRepeat):
            if node.min_hops != 1:
                raise NotImplementedError(
                    f"path repetition with min={node.min_hops} must be "
                    "handled at the pattern level (see "
                    "_compile_path_pattern)"
                )
            return transitive_closure(
                self._compile_path_terms(node.inner),
                max_hops=node.max_hops,
            )
        raise NotImplementedError(f"unsupported path node {node!r}")

    def _compile_path_pattern(self, tp: TriplePattern, bn: list) -> _BFrame:
        norm = _normalize_nps(tp.p)
        if norm is not tp.p:
            tp = TriplePattern(tp.s, norm, tp.o)
        if isinstance(tp.p, PathRepeat) and tp.p.min_hops == 0:
            # `p*` = `p+` UNION zero-length paths. Per SPARQL 1.1 (and
            # RDF4J's ZeroLengthPathIteration) the zero-length path
            # matches EVERY node of the graph — all subjects and all
            # objects — not just nodes incident to the inner path's
            # edges. The zero part binds BOTH endpoints to the same
            # node, whose id may come from either endpoint's ID space —
            # built as two single-role frames so _union reconciles the
            # spaces (decoding to terms only if the roles conflict).
            plus = self._compile_path_pattern(
                TriplePattern(
                    tp.s, PathRepeat(tp.p.inner, 1, tp.p.max_hops), tp.o
                ),
                bn,
            )
            spark = self.spo.sparkSession

            def const_lex(x) -> str:
                t = x.as_term() if isinstance(x, NumLit) else x
                return t.lex

            if isinstance(tp.s, Var) and isinstance(tp.o, Var):
                sv, ov = tp.s.name, tp.o.name
                zero_src = _BFrame(
                    self.spo.select(
                        F.col("s").alias(sv), F.col("s").alias(ov)
                    ).distinct(),
                    {sv: "s", ov: "s"},
                )
                zero_dst = _BFrame(
                    self.ops.select(
                        F.col("o").alias(sv), F.col("o").alias(ov)
                    ).distinct(),
                    {sv: "o", ov: "o"},
                )
                u = self._union([plus, zero_src, zero_dst])
            elif isinstance(tp.s, Var) or isinstance(tp.o, Var):
                # one constant endpoint: the zero-length path binds the
                # variable to THAT term (one term-kind row; _union
                # reconciles against the plus-half's id binding)
                var = (tp.s if isinstance(tp.s, Var) else tp.o).name
                lex = const_lex(tp.o if isinstance(tp.s, Var) else tp.s)
                zero = _BFrame(
                    spark.createDataFrame([(lex,)], f"{var} string"),
                    {var: "term"},
                )
                u = self._union([plus, zero])
            else:
                # both constant: zero-length matches iff the terms are
                # equal; keep the plus-half's existence-frame shape
                if const_lex(tp.s) == const_lex(tp.o):
                    aux = plus.df.columns[0]
                    one = spark.range(1).select(F.lit(1).alias(aux))
                    u = _BFrame(
                        plus.df.unionByName(one), dict(plus.kinds)
                    )
                else:
                    u = plus
            u.df = u.df.dropDuplicates(sorted(u.kinds) or None)
            return u
        if _path_roles(tp.p) is None:
            # role conflict (e.g. p|^p, !(p|^q) after normalization):
            # split alternatives into single-role branches, compile
            # each as its own pattern, and let _union reconcile the
            # endpoint ID spaces (decoding to terms only where they
            # genuinely differ). A conflict locked inside a closure —
            # (p|^p)+ — cannot decompose (the closure interleaves the
            # branch edge sets), so that one branch evaluates in term
            # space: exact, at decode-join cost, documented in
            # _compile_path_terms.
            branches = _distribute_alts(tp.p)
            if len(branches) > 1:
                parts = [
                    self._compile_path_pattern(
                        TriplePattern(tp.s, b, tp.o), bn
                    )
                    for b in branches
                ]
                if not parts[0].kinds:  # both endpoints constant: the
                    # union is pure existence — any branch nonempty
                    bn[0] += 1
                    aux = f"__aux_e{bn[0]}"
                    df = parts[0].df.select(F.lit(1).alias(aux))
                    for p in parts[1:]:
                        df = df.unionByName(
                            p.df.select(F.lit(1).alias(aux))
                        )
                    return _BFrame(df.limit(1), {})
                u = self._union(parts)
                u.df = u.df.dropDuplicates(sorted(u.kinds))
                return u
            edges = self._compile_path_terms(branches[0])
            src_role = dst_role = "term"
        else:
            edges, src_role, dst_role = self._compile_path(tp.p)
        kinds: dict = {}
        df = edges

        def endpoint(x, col, role):
            nonlocal df
            if isinstance(x, Var):
                name = x.name
            elif isinstance(x, Term) and x.lex.startswith("_:"):
                name = f"__bn_{x.lex[2:]}"
            else:
                if role == "term":
                    df = df.filter(F.col(col) == F.lit(_const_lex(x)))
                else:
                    df = df.filter(
                        F.col(col)
                        == F.lit(self._const_id(role, _const_lex(x)))
                    )
                df = df.drop(col)
                return
            if name in kinds:  # same var on both endpoints
                other = "src" if col == "dst" else "dst"
                cond = F.col(other) == F.col(col)
                if role != kinds[name] and role != "term":
                    # cross-role equality holds only in the SH range
                    cond = cond & (F.col(col) <= F.lit(self.n_shared))
                    kinds[name] = "so"
                df = df.filter(cond).drop(col)
                return
            df = df.withColumnRenamed(col, name)
            kinds[name] = role

        endpoint(tp.s, "src", src_role)
        endpoint(tp.o, "dst", dst_role)
        if not kinds:  # both endpoints constant: pure existence
            bn[0] += 1
            df = df.select(F.lit(1).alias(f"__aux_e{bn[0]}")).limit(1)
        return _BFrame(df, kinds)

    # -- binding joins ---------------------------------------------------

    def _join(
        self, a: _BFrame, b: _BFrame, how: str, exists: bool = False
    ) -> _BFrame:
        # hidden decode columns must never act as join keys
        a.df = _drop_aux(a.df)
        b.df = _drop_aux(b.df)
        on = sorted(set(a.kinds) & set(b.kinds))
        for v in on:
            ka, kb = a.kinds[v], b.kinds[v]
            id_a, id_b = ka in _ID_KINDS, kb in _ID_KINDS
            if id_a and id_b:
                if "p" in (ka, kb) and ka != kb:
                    self._to_term(a, v)
                    self._to_term(b, v)
            elif ka == "term" and kb == "term":
                pass
            else:
                if "val" in (ka, kb):
                    raise NotImplementedError(
                        f"joining BIND-computed ?{v} with pattern bindings"
                    )
                if id_a:
                    self._to_term(a, v)
                if id_b:
                    self._to_term(b, v)
        if (
            how == "inner"
            and set(on) & b.maybe_null
            and not (set(on) & a.maybe_null)
        ):
            # inner joins are symmetric: flip so the possibly-null side
            # is on the left, where the compat split operates (the
            # common case is VALUES ... UNDEF joined into a group)
            a, b = b, a
        roles_a = {v: k for v, k in a.kinds.items() if k in _ID_KINDS}
        roles_b = {v: k for v, k in b.kinds.items() if k in _ID_KINDS}
        nullable_shared = sorted(set(on) & a.maybe_null)
        if set(on) & b.maybe_null:
            raise NotImplementedError(
                f"shared variable(s) {sorted(set(on) & b.maybe_null)} may "
                "be unbound on the RIGHT operand of a join — two-sided "
                "compatibility joins are not supported"
            )
        if nullable_shared:
            df = self._compat_join(
                a.df, b.df, how, roles_a, roles_b, nullable_shared, set(on),
                exists=exists,
            )
        else:
            df = join_bindings(a.df, b.df, how, roles_a, roles_b,
                               self.n_shared)
        df = _drop_aux(df)
        if how in ("left_anti", "left_semi"):
            return _BFrame(df, dict(a.kinds), set(a.maybe_null))
        kinds = dict(a.kinds)
        for v, kb in b.kinds.items():
            if v in kinds:
                ka = kinds[v]
                if ka != kb and {ka, kb} <= {"s", "o", "so"}:
                    kinds[v] = "so"
            else:
                kinds[v] = kb
        kinds = {v: k for v, k in kinds.items() if not v.startswith("__aux")}
        mn = set(a.maybe_null) | set(b.maybe_null)
        if how == "left":
            # OPTIONAL: right-only vars are NULL on unmatched rows, and
            # a possibly-null shared var stays possibly-null (no match
            # leaves it unbound)
            mn |= set(b.kinds) - set(a.kinds)
        else:
            # inner join: shared vars come out bound (the compat join
            # fills the null side from the right operand)
            mn -= set(on)
        return _BFrame(df, kinds, {v for v in mn if v in kinds})

    def _compat_join(
        self,
        left: DataFrame,
        right: DataFrame,
        how: str,
        roles_a: dict,
        roles_b: dict,
        nullable_shared: list,
        on: set,
        exists: bool = False,
    ) -> DataFrame:
        """SPARQL compatibility join when some shared variables may be
        unbound (NULL) on the left operand (post-OPTIONAL bindings,
        UNION padding).

        SPARQL solution compatibility (SPARQL 1.1 §18.3) treats an
        unbound variable as compatible with ANY binding, so a plain
        equi-join would silently drop those rows. A single null-tolerant
        OR-condition would force a nested-loop join, so instead the left
        frame is split by its null-mask over the possibly-null shared
        variables: each of the 2^k sub-frames equi-joins on the shared
        variables it actually binds (every sub-join stays hash-joinable
        and broadcast-eligible), and the union of sub-results is exact.
        k is capped — it is the count of OPTIONAL-bound variables later
        re-joined, ≥4 of which in one join is pathological.

        MINUS additionally requires a variable bound in BOTH solutions
        (SPARQL 1.1 §8.3): the all-null mask removes nothing when it
        covers every shared variable.
        """
        if len(nullable_shared) > 3:
            raise NotImplementedError(
                f"{len(nullable_shared)} possibly-unbound shared "
                "variables in one join (2^k split would explode)"
            )
        out = None
        for r in range(len(nullable_shared) + 1):
            for mask_t in combinations(nullable_shared, r):
                mask = set(mask_t)
                sub = left
                for v in nullable_shared:
                    sub = sub.filter(
                        F.col(v).isNull() if v in mask else
                        F.col(v).isNotNull()
                    )
                # hide the null columns from the join: rename, join on
                # the remaining shared vars, then restore/merge
                for v in mask:
                    sub = sub.withColumnRenamed(v, f"__mn_{v}")
                sub_roles = {
                    v: k for v, k in roles_a.items() if v not in mask
                }
                if how == "left_anti" and exists and mask >= on:
                    # NOT EXISTS with every shared var unbound: the
                    # unbound row is compatible with ANY match, so it
                    # is dropped iff the subgroup matches at all —
                    # unlike MINUS, which keeps it (no common bound
                    # variable, SPARQL 1.1 §8.3)
                    joined = sub.join(right, F.lit(True), "left_anti")
                else:
                    joined = join_bindings(
                        sub, right, how, sub_roles, roles_b, self.n_shared
                    )
                if how in ("left_anti", "left_semi"):
                    for v in mask:
                        joined = joined.withColumnRenamed(f"__mn_{v}", v)
                else:
                    # the shared var's value comes from the right side
                    # (left is NULL in this mask by construction)
                    for v in mask:
                        joined = joined.drop(f"__mn_{v}")
                out = joined if out is None else out.unionByName(joined)
        return out

    def _to_term(self, bf: _BFrame, v: str) -> None:
        """Replace a variable's ID column with its lexical term string
        (the ID->Value bridge). Left join so OPTIONAL NULLs survive."""
        k = bf.kinds[v]
        if k in ("term", "val"):
            bf.kinds[v] = "term"
            return
        m = self._role_map(k).select(
            F.col("term").alias("__aux_t"), F.col("id").alias("__aux_i")
        )
        if k in ("p", "g"):
            m = F.broadcast(m)
        bf.df = (
            bf.df.join(m, bf.df[v] == m["__aux_i"], "left")
            .drop("__aux_i")
            .drop(v)
            .withColumnRenamed("__aux_t", v)
        )
        bf.kinds[v] = "term"

    def _lex(self, bf: _BFrame, v: str) -> Column:
        """Lexical term string for a variable, materializing a hidden
        decode column on first use."""
        k = bf.kinds[v]
        if k in ("term", "val"):
            return bf.df[v]
        hidden = f"__lex_{v}"
        if hidden not in bf.df.columns:
            m = self._role_map(k).select(
                F.col("term").alias(hidden), F.col("id").alias("__aux_i")
            )
            if k in ("p", "g"):
                m = F.broadcast(m)
            bf.df = bf.df.join(
                m, bf.df[v] == m["__aux_i"], "left"
            ).drop("__aux_i")
        return bf.df[hidden]

    # -- expressions -----------------------------------------------------

    def _expr(self, node, bf: _BFrame) -> tuple[Column, str]:
        """Compile an expression AST to (Column, type) with type in
        num | str | bool | term | val."""
        if isinstance(node, Var):
            if node.name not in bf.kinds:
                return F.lit(None), "val"
            k = bf.kinds[node.name]
            if k == "val":
                return bf.df[node.name], "val"
            return self._lex(bf, node.name), "term"
        if isinstance(node, NumLit):
            return F.lit(node.value), "num"
        if isinstance(node, StrLit):
            return F.lit(node.value), "str"
        if isinstance(node, Term):
            return F.lit(node.lex), "term"
        if isinstance(node, UnaryOp):
            c, t = self._expr(node.operand, bf)
            if node.op == "!":
                return ~c.cast("boolean"), "bool"
            return -_as_num(c, t), "num"
        if isinstance(node, BinOp):
            return self._binop(node, bf)
        if isinstance(node, FuncCall):
            return self._func(node, bf)
        raise NotImplementedError(f"unsupported expression {node!r}")

    def _binop(self, node: BinOp, bf: _BFrame) -> tuple[Column, str]:
        op = node.op
        lc, lt = self._expr(node.left, bf)
        rc, rt = self._expr(node.right, bf)
        if op in ("||", "&&"):
            lb, rb = lc.cast("boolean"), rc.cast("boolean")
            return (lb | rb) if op == "||" else (lb & rb), "bool"
        if op in ("+", "-", "*", "/"):
            ln, rn = _as_num(lc, lt), _as_num(rc, rt)
            return {
                "+": ln + rn, "-": ln - rn, "*": ln * rn, "/": ln / rn
            }[op], "num"
        # comparisons: numeric when either side is numeric, else string
        numeric = "num" in (lt, rt) or "val" in (lt, rt)

        def _cmp(a: Column, b: Column) -> Column:
            return {
                "=": a == b, "!=": a != b, "<": a < b,
                ">": a > b, "<=": a <= b, ">=": a >= b,
            }[op]

        if numeric:
            return _cmp(_as_num(lc, lt), _as_num(rc, rt)), "bool"
        if lt == rt == "term":
            # two non-constant operands (e.g. FILTER(?a < ?b)): RDF4J
            # dispatches on value type — compare numerically per-row
            # when BOTH lexical forms are numeric literals, else fall
            # back to lexical-form comparison (IRIs, dates, strings).
            ln, rn = _as_num(lc, lt), _as_num(rc, rt)
            return F.when(
                ln.isNotNull() & rn.isNotNull(), _cmp(ln, rn)
            ).otherwise(_cmp(lc, rc)), "bool"
        # term-vs-plain-string equality is RDF term equality: wrap
        # the plain string as a plain-literal lexical form
        if lt == "term" and rt == "str":
            rc = F.concat(F.lit('"'), rc, F.lit('"'))
        elif rt == "term" and lt == "str":
            lc = F.concat(F.lit('"'), lc, F.lit('"'))
        return _cmp(lc, rc), "bool"

    def _func(self, node: FuncCall, bf: _BFrame) -> tuple[Column, str]:
        name = node.name

        def arg(i, want=None):
            c, t = self._expr(node.args[i], bf)
            if want == "str":
                return _as_str(c, t)
            if want == "num":
                return _as_num(c, t)
            return c, t

        if name == "BOUND":
            v = node.args[0]
            if not isinstance(v, Var):
                raise ValueError("BOUND takes a variable")
            if v.name not in bf.kinds:
                return F.lit(False), "bool"
            return bf.df[v.name].isNotNull(), "bool"
        if name == "STR":
            return arg(0, "str"), "str"
        if name == "LANG":
            c, t = arg(0)
            return F.coalesce(
                F.regexp_extract(c, r"@([A-Za-z0-9-]+)$", 1), F.lit("")
            ), "str"
        if name == "DATATYPE":
            c, t = arg(0)
            dt = F.regexp_extract(c, r"\^\^<([^>]*)>$", 1)
            return F.when(dt != "", dt).when(
                c.startswith('"'),
                F.lit("http://www.w3.org/2001/XMLSchema#string"),
            ).otherwise(F.lit("")), "str"
        if name == "REGEX":
            s = arg(0, "str")
            pat = node.args[1]
            if not isinstance(pat, StrLit):
                raise NotImplementedError("REGEX pattern must be a literal")
            return s.rlike(pat.value), "bool"
        if name in ("STRSTARTS", "STRENDS", "CONTAINS"):
            a = arg(0, "str")
            b = arg(1, "str")
            fn = {
                "STRSTARTS": a.startswith(b),
                "STRENDS": a.endswith(b),
                "CONTAINS": a.contains(b),
            }[name]
            return fn, "bool"
        if name == "STRLEN":
            return F.length(arg(0, "str")), "num"
        if name == "UCASE":
            return F.upper(arg(0, "str")), "str"
        if name == "LCASE":
            return F.lower(arg(0, "str")), "str"
        if name == "ABS":
            return F.abs(arg(0, "num")), "num"
        if name in ("ISIRI", "ISURI"):
            c, t = arg(0)
            return (
                ~c.startswith('"') & ~c.startswith("_:") & c.isNotNull()
            ), "bool"
        if name == "ISLITERAL":
            c, t = arg(0)
            return c.startswith('"'), "bool"
        if name == "ISBLANK":
            c, t = arg(0)
            return c.startswith("_:"), "bool"
        if name == "SAMETERM":
            a0, t0 = arg(0)
            a1, t1 = arg(1)
            return a0 == a1, "bool"
        if name == "COALESCE":
            cols = [self._expr(a, bf)[0] for a in node.args]
            return F.coalesce(*cols), "val"
        if name == "IF":
            c, _ = self._expr(node.args[0], bf)
            a, ta = self._expr(node.args[1], bf)
            b, _ = self._expr(node.args[2], bf)
            return F.when(c.cast("boolean"), a).otherwise(b), ta
        if name == "ROUND":
            # XPath fn:round: half rounds toward positive infinity
            return F.floor(arg(0, "num") + F.lit(0.5)), "num"
        if name == "CEIL":
            return F.ceil(arg(0, "num")).cast("double"), "num"
        if name == "FLOOR":
            return F.floor(arg(0, "num")).cast("double"), "num"
        if name == "SUBSTR":
            s = arg(0, "str")
            start = arg(1, "num").cast("int")
            if len(node.args) > 2:
                return s.substr(start, arg(2, "num").cast("int")), "str"
            return s.substr(start, F.length(s)), "str"
        if name == "CONCAT":
            return F.concat(
                *[arg(i, "str") for i in range(len(node.args))]
            ), "str"
        if name == "REPLACE":
            pat, rep = node.args[1], node.args[2]
            if not isinstance(pat, StrLit) or not isinstance(rep, StrLit):
                raise NotImplementedError(
                    "REPLACE pattern/replacement must be literals"
                )
            return F.regexp_replace(
                arg(0, "str"), pat.value, rep.value
            ), "str"
        if name == "STRBEFORE":
            s, b = arg(0, "str"), arg(1, "str")
            pos = F.instr(s, b)
            return F.when(pos > 0, s.substr(F.lit(1), pos - 1)).otherwise(
                F.lit("")
            ), "str"
        if name == "STRAFTER":
            s, b = arg(0, "str"), arg(1, "str")
            pos = F.instr(s, b)
            return F.when(
                pos > 0, F.substring(s, pos + F.length(b), F.length(s))
            ).otherwise(F.lit("")), "str"
        if name == "ENCODE_FOR_URI":
            return F.url_encode(arg(0, "str")), "str"
        if name == "MD5":
            return F.md5(arg(0, "str")), "str"
        if name == "SHA1":
            return F.sha1(arg(0, "str")), "str"
        if name in ("SHA256", "SHA384", "SHA512"):
            return F.sha2(arg(0, "str"), int(name[3:])), "str"
        if name in ("IRI", "URI"):
            return arg(0, "str"), "term"  # bare-IRI internal form
        if name == "STRDT":
            dt = node.args[1]
            if isinstance(dt, Term):
                dtc = F.lit(dt.lex)
            else:
                dtc = arg(1, "str")
            return F.concat(
                F.lit('"'), arg(0, "str"), F.lit('"^^<'), dtc, F.lit(">")
            ), "term"
        if name == "STRLANG":
            return F.concat(
                F.lit('"'), arg(0, "str"), F.lit('"@'), arg(1, "str")
            ), "term"
        if name == "ISNUMERIC":
            c, t = arg(0)
            return _as_num(c, t).isNotNull() & c.startswith('"'), "bool"
        if name == "LANGMATCHES":
            tag, rng = F.lower(arg(0, "str")), F.lower(arg(1, "str"))
            return F.when(rng == "*", tag != "").otherwise(
                (tag == rng) | tag.startswith(F.concat(rng, F.lit("-")))
            ), "bool"
        if name in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS"):
            ts = arg(0, "str").try_cast("timestamp")
            fn = {
                "YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth,
                "HOURS": F.hour, "MINUTES": F.minute, "SECONDS": F.second,
            }[name]
            return fn(ts).cast("double"), "num"
        raise NotImplementedError(f"function {name}")

    # -- query forms -----------------------------------------------------

    def _select(self, bf: _BFrame, q: Query) -> DataFrame:
        bf = self._maybe_aggregate(bf, q)
        if q.projection:
            out_cols = [
                p.name if isinstance(p, Var) else p.alias
                for p in q.projection
            ]
        else:  # SELECT *
            out_cols = list(bf.kinds)
        # decode projected id columns to lexical terms; a projected
        # variable the pattern never binds is legal SPARQL and simply
        # unbound (NULL) in every solution
        for c in out_cols:
            if c in bf.kinds and bf.kinds[c] in _ID_KINDS:
                self._to_term(bf, c)
            elif c not in bf.kinds and c not in bf.df.columns:
                bf.df = bf.df.withColumn(c, F.lit(None).cast("string"))
        df = self._order_distinct_slice(bf, q, out_cols)
        return df.select(*out_cols)

    def _order_distinct_slice(
        self, bf: _BFrame, q: Query, out_cols: list[str]
    ) -> DataFrame:
        """Shared ORDER BY / DISTINCT / OFFSET / LIMIT tail.

        Sort keys become named columns BEFORE projection so ORDER BY
        over non-projected variables / expressions still works. Each
        ORDER BY expression expands to a (category, numeric, lexical)
        key triple approximating the SPARQL value order the way RDF4J's
        ValueComparator does: unbound < blank node < IRI < literal,
        numeric literals compared by value, everything else by lexical
        form. DISTINCT dedups on the PROJECTED columns only — the sort
        keys pick a deterministic representative per projected row via
        row_number, so a sort key that is not functionally dependent on
        the projection cannot leak duplicates.
        """
        sort_cols: list[tuple[str, bool]] = []
        for i, (expr, asc) in enumerate(q.order_by):
            col, t = self._expr(expr, bf)
            s = col.cast("string")
            num = _as_num(col, t)
            if t in ("num", "val", "bool"):
                cat = F.when(col.isNull(), F.lit(0)).otherwise(F.lit(3))
            else:
                cat = (
                    F.when(col.isNull(), F.lit(0))
                    .when(s.startswith("_:"), F.lit(1))
                    .when(s.startswith('"'), F.lit(3))
                    .otherwise(F.lit(2))
                )
            kname, nname, sname = f"__ob_{i}_k", f"__ob_{i}_n", f"__ob_{i}_s"
            bf.df = (
                bf.df.withColumn(kname, cat)
                .withColumn(nname, num)
                .withColumn(sname, s)
            )
            sort_cols += [(kname, asc), (nname, asc), (sname, asc)]
        df = bf.df
        order_exprs = [
            F.col(n).asc() if asc else F.col(n).desc() for n, asc in sort_cols
        ]
        if q.distinct:
            if sort_cols:
                w = Window.partitionBy(*out_cols).orderBy(*order_exprs)
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                df = df.dropDuplicates(out_cols)
        if sort_cols:
            df = df.sort(*order_exprs)
        if q.offset:
            df = df.offset(q.offset)
        if q.limit is not None:
            df = df.limit(q.limit)
        return df

    def _maybe_aggregate(self, bf: _BFrame, q: Query) -> _BFrame:
        """Aggregate when anything asks for it (explicit aggregates,
        GROUP BY, or aggregates nested in projection expressions /
        HAVING); otherwise compute pure projection expressions
        ((?a - ?b AS ?d)) directly over the solution frame, BIND-like."""
        aggs = [p for p in q.projection if isinstance(p, Aggregate)]
        nested: dict = {}
        for p in q.projection:
            if isinstance(p, ProjExpr):
                _collect_expr_aggs(p.expr, nested)
        if q.having is not None:
            _collect_expr_aggs(q.having, nested)
        if aggs or q.group_by or nested:
            return self._aggregate(bf, q)
        for p in q.projection:
            if isinstance(p, ProjExpr):
                if p.alias in bf.kinds:
                    raise ValueError(f"AS rebinds ?{p.alias}")
                col, _ = self._expr(p.expr, bf)
                bf.df = bf.df.withColumn(p.alias, col)
                bf.kinds[p.alias] = "val"
        return bf

    def _subframe(self, q: Query) -> _BFrame:
        """Nested `{ SELECT ... }`: evaluated like a top-level SELECT
        but kept in the binding representation (ids stay ids) so the
        outer group joins it like any other operand — Catalyst then
        plans the whole composed query as one tree."""
        bf = self._compile_group(q.where)
        bf = self._maybe_aggregate(bf, q)
        names = [
            p.name if isinstance(p, Var) else p.alias for p in q.projection
        ] or list(bf.kinds)
        df = self._order_distinct_slice(bf, q, names)
        return _BFrame(
            df.select(*names),
            {v: bf.kinds[v] for v in names},
            {v for v in bf.maybe_null if v in names},
        )

    def _aggregate(self, bf: _BFrame, q: Query) -> _BFrame:
        group_vars = [v.name for v in q.group_by]
        aggs = [p for p in q.projection if isinstance(p, Aggregate)]
        # aggregates nested inside projection expressions
        # ((SUM(?x)/COUNT(*) AS ?m)) or HAVING conditions get synthetic
        # output columns; the outer expression then compiles over the
        # grouped frame with those columns substituted in
        nested: dict = {}
        for p in q.projection:
            if isinstance(p, ProjExpr):
                _collect_expr_aggs(p.expr, nested)
        if q.having is not None:
            _collect_expr_aggs(q.having, nested)
        aggs = aggs + [
            Aggregate(a.func, a.arg, a.distinct, alias, a.sep)
            for a, alias in nested.items()
        ]
        # materialize every decode column BEFORE building agg
        # expressions: _lex joins mutate bf.df, and an expression built
        # against an earlier frame must not be used in a later one
        for a in aggs:
            if (
                isinstance(a.arg, Var)
                and a.func != "COUNT"
                and a.arg.name in bf.kinds
            ):
                self._lex(bf, a.arg.name)
        # computed aggregate args (SUM(?a * ?b), COUNT(STR(?o)), ...):
        # materialize the expression as a pre-aggregation column, then
        # aggregate it like a 'val'-kind variable
        expr_args: dict[int, str] = {}
        for i, a in enumerate(aggs):
            if a.arg == "*" or isinstance(a.arg, Var):
                continue
            col, _ = self._expr(a.arg, bf)
            name = f"__aggarg_{i}"
            bf.df = bf.df.withColumn(name, col)
            bf.kinds[name] = "val"
            expr_args[i] = name
        exprs = []
        agg_kinds: dict[str, str] = {}
        for i, a in enumerate(aggs):
            agg_kinds[a.alias] = "val"
            if a.arg == "*":
                col = F.count(F.lit(1))
            else:
                v = expr_args.get(i) or a.arg.name
                if v not in bf.kinds:
                    raise ValueError(f"aggregate over unbound ?{v}")
                if a.func == "COUNT":
                    col = (
                        F.count_distinct(bf.df[v])
                        if a.distinct
                        else F.count(bf.df[v])
                    )
                elif a.func == "SAMPLE":
                    # SAMPLE may return any binding; min of the lexical
                    # form is a valid choice and deterministic (so the
                    # oracle can reproduce it)
                    col = F.min(self._lex(bf, v))
                    agg_kinds[a.alias] = "term"
                elif a.func == "GROUP_CONCAT":
                    lex = self._lex(bf, v)
                    vals = (
                        F.collect_set(lex) if a.distinct
                        else F.collect_list(lex)
                    )
                    # sorted for determinism (SPARQL leaves the order
                    # unspecified; a fixed order makes results stable
                    # across partitionings AND engines)
                    col = F.concat_ws(a.sep, F.sort_array(vals))
                else:
                    num = _as_num(
                        self._lex(bf, v),
                        "term" if bf.kinds[v] != "val" else "val",
                    )
                    fn = {
                        "SUM": F.sum_distinct if a.distinct else F.sum,
                        "AVG": F.avg,
                        "MIN": F.min,
                        "MAX": F.max,
                    }[a.func]
                    col = fn(num)
            exprs.append(col.alias(a.alias))
        if group_vars:
            gdf = bf.df.groupBy(*[bf.df[v] for v in group_vars]).agg(*exprs)
        else:
            gdf = bf.df.agg(*exprs)
        kinds = {v: bf.kinds[v] for v in group_vars}
        kinds.update(agg_kinds)
        out = _BFrame(
            gdf, kinds, {v for v in bf.maybe_null if v in group_vars}
        )
        if q.having is not None:
            col, _ = self._expr(
                _replace_expr_aggs(q.having, nested), out
            )
            out.df = out.df.filter(col.cast("boolean"))
        for p in q.projection:
            if isinstance(p, ProjExpr):
                if p.alias in out.kinds:
                    raise ValueError(f"AS rebinds ?{p.alias}")
                col, _ = self._expr(
                    _replace_expr_aggs(p.expr, nested), out
                )
                out.df = out.df.withColumn(p.alias, col)
                out.kinds[p.alias] = "val"
        return out

    def _construct(self, bf: _BFrame, q: Query) -> DataFrame:
        frames = []
        for tp in q.template:
            cols = []
            notnull = []
            for name, x in (("s", tp.s), ("p", tp.p), ("o", tp.o)):
                if isinstance(x, Var):
                    c = self._lex(bf, x.name)
                    cols.append(c.alias(name))
                    notnull.append(c.isNotNull())
                elif isinstance(x, Term) and x.lex.startswith("_:"):
                    # template bnodes mint a FRESH bnode per solution
                    # (SPARQL 1.1 §16.2.1) — skolemized from the full
                    # binding row so equal solutions reuse one label
                    row_hash = F.md5(
                        F.concat_ws(
                            "\x1f",
                            *[
                                F.coalesce(
                                    bf.df[v].cast("string"), F.lit("")
                                )
                                for v in sorted(bf.kinds)
                            ],
                        )
                    )
                    cols.append(
                        F.concat(
                            F.lit(x.lex + "_"), row_hash
                        ).alias(name)
                    )
                else:
                    t = x.as_term() if isinstance(x, NumLit) else x
                    cols.append(F.lit(t.lex).alias(name))
            df = bf.df
            # SPARQL skips template instantiations with unbound vars
            cond = None
            for c in notnull:
                cond = c if cond is None else (cond & c)
            sel = df.select(*cols)
            if cond is not None:
                sel = df.filter(cond).select(*cols)
            frames.append(sel)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.dropDuplicates(["s", "p", "o"])


# ---------------------------------------------------------------- helpers


def _strip_dataset(q: Query) -> Query:
    """Copy a query without its dataset clauses (already applied)."""
    import dataclasses

    return dataclasses.replace(q, from_graphs=[], from_named=[])


def _drop_aux(df: DataFrame) -> DataFrame:
    aux = [c for c in df.columns if c.startswith("__aux") or c.startswith("__lex_")]
    return df.drop(*aux) if aux else df


def _as_num(c: Column, t: str) -> Column:
    """Numeric value of an expression: literals extract their lexical
    value (non-numeric -> NULL, which drops the row in a FILTER —
    SPARQL's type-error-eliminates-solution semantics). try_cast, not
    cast: under ANSI mode Catalyst may push this expression below the
    decode join into the full dictionary scan, where non-numeric
    terms are expected and must yield NULL, not a task failure."""
    if t == "num":
        return c
    if t in ("val",):
        return c.try_cast("double")
    if t in ("term", "str"):
        return F.when(
            c.startswith('"'),
            F.regexp_extract(c, _LIT_VALUE_RE, 1),
        ).otherwise(c).try_cast("double")
    return c.try_cast("double")


def _as_str(c_t, t: str | None = None) -> Column:
    """SPARQL STR(): literal lexical value, or the IRI text itself."""
    if t is None:
        c, t = c_t
    else:
        c = c_t
    if t in ("num", "val"):
        return c.cast("string")
    if t == "str":
        return c
    return F.when(
        c.startswith('"'), F.regexp_extract(c, _LIT_VALUE_RE, 1)
    ).otherwise(c)


def _collect_consts(q: Query) -> set[tuple[str, str]]:
    """All (role, lexical) constants a query will look up — one walk,
    so _prefetch_consts can batch the dictionary lookups."""
    out: set[tuple[str, str]] = set()

    def term(x, role):
        if isinstance(x, NumLit):
            x = x.as_term()
        if isinstance(x, Term) and not x.lex.startswith("_:"):
            out.add((role, x.lex))

    def path(node):
        if isinstance(node, PathPred):
            out.add(("p", node.iri))
        elif isinstance(node, PathInv):
            path(node.inner)
        elif isinstance(node, PathSeq):
            for s in node.steps:
                path(s)
        elif isinstance(node, PathAlt):
            for a in node.alts:
                path(a)
        elif isinstance(node, PathRepeat):
            path(node.inner)
        elif isinstance(node, PathNeg):
            for iri in node.fwd + node.bwd:
                out.add(("p", iri))

    def group(g: GroupGraphPattern):
        for el in g.elements:
            if isinstance(el, TriplePattern):
                term(el.s, "s")
                term(el.o, "o")
                if isinstance(el.p, Term):
                    out.add(("p", el.p.lex))
                elif not isinstance(el.p, Var):
                    path(el.p)
            elif isinstance(el, OptionalGroup):
                group(el.group)
            elif isinstance(el, MinusGroup):
                group(el.group)
            elif isinstance(el, UnionGroup):
                for b in el.branches:
                    group(b)
            elif isinstance(el, GraphGroup):
                term(el.graph, "g")
                group(el.group)
            elif isinstance(el, SubSelect):
                group(el.query.where)
            elif isinstance(el, FilterClause) and isinstance(
                el.expr, ExistsExpr
            ):
                group(el.expr.group)

    group(q.where)
    for t in list(q.from_graphs) + list(q.from_named):
        out.add(("g", t.lex))
    return out
