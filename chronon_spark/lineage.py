"""Column-level lineage: output column -> input column edges for GroupBy /
Join / Query definitions, parsed by CATALYST itself.

The reference parses its rendered SQL with sqlglot to produce
ColumnTransform(input_table, input_column, output_table, output_column,
transforms) edges plus table/feature indexes
(api/py/ai/chronon/lineage/lineage_parser.py:1-798,
lineage_metadata.py:55-80). The Spark-first twin skips the third-party SQL
parser entirely: every expression in this engine is already Spark SQL, so
we hand it to ``sessionState().sqlParser().parseExpression`` and walk the
Catalyst tree (via its stable ``toJSON`` pre-order encoding) — the parse is
done by the SAME grammar that will execute the expression, so lineage can
never disagree with the engine about what an expression references.

Edge semantics match the reference:

- ``transforms`` is the chain of functions/operators on the path from the
  expression root to the referenced column (root-first), e.g.
  ``SUM(IF(status='refund', -amt, amt))`` yields amt edges with
  ``('sum', 'if', 'unaryminus')`` and a status edge ``('sum', 'if',
  'equalto')``.
- GroupBy lineage: source selects (Query.selects exprs over the raw
  table), aggregation outputs <- input/bucket/time columns (transform =
  the op, window suffix as a transform step), derivations (incl. ``*``
  passthrough) over the post-agg namespace.
- Join lineage: left passthrough, part-prefixed feature columns <- the
  part GroupBy's backfill columns, external parts' value columns <- their
  serving-time source fields.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import SparkSession

from chronon_spark.api import GroupBy, Join, Query


@dataclass(frozen=True)
class ColumnLineage:
    """One edge (reference lineage_metadata.ColumnTransform)."""

    output_table: str
    output_column: str
    input_table: str
    input_column: str
    transforms: tuple = ()

    def as_dict(self) -> dict:
        return {
            "output_table": self.output_table,
            "output_column": self.output_column,
            "input_table": self.input_table,
            "input_column": self.input_column,
            "transforms": list(self.transforms),
        }


# ---------------------------------------------------------------------------
# Catalyst expression walk
# ---------------------------------------------------------------------------


def _parse_tree(spark: SparkSession, expr: str) -> list[dict]:
    """Parse a Spark SQL expression with the session's own parser; returns
    the Catalyst TreeNode ``toJSON`` pre-order node list."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    return json.loads(parser.parseExpression(expr).toJSON())


def _name_parts(raw: str) -> list[str]:
    # toJSON renders Seq[String] as "[a, b]"
    return [p.strip() for p in raw.strip("[]").split(",") if p.strip()]


def _node_label(node: dict) -> str | None:
    """Transform label for a tree node: function name for UnresolvedFunction,
    lowercased Catalyst class for operators (Add, CaseWhen, Cast...); None
    for structural nodes that aren't transforms (Alias, leaf refs)."""
    cls = node.get("class", "").rsplit(".", 1)[-1]
    if cls == "UnresolvedFunction":
        return _name_parts(node.get("nameParts", "")).pop().lower()
    if cls in ("UnresolvedAttribute", "Literal", "Alias", "UnresolvedStar"):
        return None
    return cls.lower()


def expression_inputs(spark: SparkSession, expr: str) -> dict[str, list[tuple]]:
    """Input column -> list of transform chains (root-first) for one Spark
    SQL expression. Qualified references keep only the column name (the
    engine scans a single source frame). ``*`` maps to the pseudo-column
    ``"*"`` so callers can expand it against a known namespace."""
    nodes = _parse_tree(spark, expr)
    out: dict[str, list[tuple]] = {}

    def walk(i: int, path: tuple) -> int:
        """Visit node i with the transform path so far; return the index
        just past its subtree (pre-order encoding)."""
        node = nodes[i]
        cls = node.get("class", "").rsplit(".", 1)[-1]
        if cls == "UnresolvedAttribute":
            col = _name_parts(node.get("nameParts", ""))[-1]
            out.setdefault(col, []).append(path)
        elif cls == "UnresolvedStar":
            out.setdefault("*", []).append(path)
        label = _node_label(node)
        child_path = path + (label,) if label else path
        j = i + 1
        for _ in range(int(node.get("num-children", 0))):
            j = walk(j, child_path)
        return j

    walk(0, ())
    return out


# ---------------------------------------------------------------------------
# full-statement (StagingQuery) lineage
# ---------------------------------------------------------------------------


def _subtrees(nodes: list[dict]) -> list[list[dict]]:
    """Split a pre-order TreeNode list into its root's child subtrees."""
    root = nodes[0]
    out, i = [], 1
    for _ in range(int(root.get("num-children", 0))):
        j, depth = i, 1
        while depth:
            depth += int(nodes[j].get("num-children", 0)) - 1
            j += 1
        out.append(nodes[i:j])
        i = j
    return out


def _expr_item(nodes: list[dict]):
    """One select-list expression (pre-order node list) ->
    (output_name | None, [((qualifier | None, column | '*'), chain), ...])."""
    refs: list = []

    def walk(i: int, path: tuple) -> int:
        node = nodes[i]
        cls = node.get("class", "").rsplit(".", 1)[-1]
        if cls == "UnresolvedAttribute":
            parts = _name_parts(node.get("nameParts", ""))
            qual = parts[-2] if len(parts) >= 2 else None
            refs.append(((qual, parts[-1]), path))
        elif cls == "UnresolvedStar":
            target = _name_parts(node.get("target", "") or "")
            refs.append(((target[-1] if target else None, "*"), path))
        label = _node_label(node)
        child_path = path + (label,) if label else path
        j = i + 1
        for _ in range(int(node.get("num-children", 0))):
            j = walk(j, child_path)
        return j

    walk(0, ())
    root = nodes[0]
    cls = root.get("class", "").rsplit(".", 1)[-1]
    if cls == "Alias":
        name = root.get("name")
    elif cls == "UnresolvedAttribute":
        name = _name_parts(root.get("nameParts", ""))[-1]
    elif cls == "UnresolvedStar":
        name = "*"
    else:
        name = None
    return name, refs


class _Scope:
    """Resolution scope for one SELECT: alias -> source, where a source is
    ("table", name) or ("virtual", mapping output_col -> edge list)."""

    def __init__(self):
        self.aliases: dict[str, tuple] = {}
        self.order: list[tuple] = []

    def add(self, alias: str, source: tuple) -> None:
        self.aliases[alias] = source
        self.order.append(source)


_PASSTHROUGH_PLANS = {
    "Filter", "Sort", "GlobalLimit", "LocalLimit", "Distinct", "UnresolvedHaving",
    "Deduplicate", "RepartitionByExpression", "Repartition", "WithCTE", "Offset",
}


def _resolve_edges(ref, chain, scope: _Scope, schemas: dict | None):
    """One (qualifier, column) reference -> concrete (table, col, chain)
    edges, composing through virtual (CTE/subquery) sources."""
    (qual, col) = ref

    def from_source(src):
        kind, payload = src
        if col == "*":
            if kind == "virtual":
                return [
                    (t, c, chain + sub)
                    for edges in payload.values()
                    for (t, c, sub) in edges
                ]
            if schemas and payload in schemas:
                return [(payload, c, chain) for c in schemas[payload]]
            return [(payload, "*", chain)]
        if kind == "virtual":
            return [(t, c, chain + sub) for (t, c, sub) in payload.get(col, [("<unknown>", col, ())])]
        return [(payload, col, chain)]

    if qual is not None and qual in scope.aliases:
        return from_source(scope.aliases[qual])
    if qual is None:
        if len(scope.order) == 1:
            return from_source(scope.order[0])
        if schemas:
            owners = [
                s for s in scope.order
                if (s[0] == "table" and col in schemas.get(s[1], ()))
                or (s[0] == "virtual" and col in s[1])
            ]
            if len(owners) == 1:
                return from_source(owners[0])
        if col == "*":
            return [e for s in scope.order for e in from_source(s)]
        return [("<ambiguous>", col, chain)]
    # qualified with an unknown alias — keep it visible rather than drop it
    return [(f"<unknown:{qual}>", col, chain)]


def _star_expand(scope: _Scope, qual: str | None, chain, schemas: dict | None) -> dict:
    """``[alias.]*`` -> output column -> edges, keyed by the source's OWN
    output names (virtual mapping keys / schema'd table columns)."""
    sources = [scope.aliases[qual]] if qual in scope.aliases else scope.order
    out: dict = {}
    for kind, payload in sources:
        if kind == "virtual":
            for col, edges in payload.items():
                out.setdefault(col, []).extend(
                    (t, c, chain + sub) for (t, c, sub) in edges
                )
        elif schemas and payload in schemas:
            for c in schemas[payload]:
                out.setdefault(c, []).append((payload, c, chain))
        else:
            out.setdefault("*", []).append((payload, "*", chain))
    return out


def _build_scope(tree: list[dict], cte_env: dict, schemas: dict | None) -> _Scope:
    scope = _Scope()

    def visit(nodes: list[dict], alias: str | None):
        root = nodes[0]
        cls = root.get("class", "").rsplit(".", 1)[-1]
        if cls == "SubqueryAlias":
            name = (root.get("identifier") or {}).get("name") or alias
            visit(_subtrees(nodes)[0], name)
        elif cls == "UnresolvedRelation":
            name = _name_parts(root.get("multipartIdentifier", ""))[-1]
            src = cte_env.get(name, ("table", name))
            scope.add(alias or name, src)
        elif cls == "Join":
            for sub in _subtrees(nodes):
                visit(sub, None)
        elif cls in _PASSTHROUGH_PLANS:
            visit(_subtrees(nodes)[0], alias)
        elif cls in ("Project", "Aggregate", "UnresolvedWith", "Union"):
            mapping = _select_mapping(nodes, dict(cte_env), schemas)
            scope.add(alias or f"__subquery{len(scope.order)}", ("virtual", mapping))
        else:  # unknown relation-producing node: opaque source
            scope.add(alias or cls.lower(), ("table", f"<{cls.lower()}>"))

    visit(tree, None)
    return scope


def _select_mapping(tree: list[dict], cte_env: dict, schemas: dict | None) -> dict:
    """Resolve a plan subtree to mapping: output column -> edge list."""
    root = tree[0]
    cls = root.get("class", "").rsplit(".", 1)[-1]
    if cls == "UnresolvedWith":
        for cte in root.get("cteRelations", []):
            name, plan = cte["_1"], cte["_2"]
            cte_env[name] = ("virtual", _select_mapping(plan, dict(cte_env), schemas))
        return _select_mapping(_subtrees(tree)[0], cte_env, schemas)
    if cls == "Union":
        merged: dict = {}
        for sub in _subtrees(tree):
            for col, edges in _select_mapping(sub, dict(cte_env), schemas).items():
                merged.setdefault(col, []).extend(
                    e for e in edges if e not in merged.get(col, [])
                )
        return merged
    if cls in _PASSTHROUGH_PLANS or cls == "SubqueryAlias":
        return _select_mapping(_subtrees(tree)[0], cte_env, schemas)
    if cls not in ("Project", "Aggregate"):
        # bare relation (SELECT-less): passthrough of whatever it exposes
        scope = _build_scope(tree, cte_env, schemas)
        out: dict = {}
        for t, c, chain in _resolve_edges((None, "*"), (), scope, schemas):
            out.setdefault(c, []).append((t, c, chain))
        return out
    items = root.get("projectList") or root.get("aggregateExpressions") or []
    scope = _build_scope(_subtrees(tree)[0], cte_env, schemas)
    mapping: dict = {}
    for idx, item in enumerate(items):
        name, refs = _expr_item(item)
        if name == "*":
            # star expansion preserves the SOURCE's output names (a virtual
            # source's mapping keys, a schema'd table's columns)
            for (qual, _c), chain in refs:
                for col, edges in _star_expand(scope, qual, chain, schemas).items():
                    dst = mapping.setdefault(col, [])
                    dst.extend(e for e in edges if e not in dst)
            continue
        out_name = name or f"_col{idx}"
        edges = mapping.setdefault(out_name, [])
        for ref, chain in refs:
            for e in _resolve_edges(ref, chain, scope, schemas):
                if e not in edges:
                    edges.append(e)
    return mapping


def _render_macros_for_parse(sql: str) -> str:
    """StagingQuery macros ({{ start_date }}, {{ max_date(table=...) }})
    are not SQL — substitute a literal so Catalyst can parse the statement
    for lineage (values are irrelevant to column edges)."""
    import re

    return re.sub(r"\{\{[^}]*\}\}", "'1970-01-01'", sql)


def sql_lineage(
    spark: SparkSession,
    sql: str,
    output_table: str,
    schemas: dict[str, list] | None = None,
) -> list[ColumnLineage]:
    """Column-level lineage for a FULL SQL statement (the reference's
    staging-query path, lineage_parser.parse_staging_query): the statement
    parses through Catalyst's parsePlan and the unresolved logical plan is
    walked — CTEs become virtual sources whose edges compose, table/
    subquery aliases resolve qualified references, unqualified references
    resolve by sole-source or the optional ``schemas`` map (table ->
    columns; the reference's schema_provider), else surface as
    '<ambiguous>' rather than silently guessing."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    tree = json.loads(parser.parsePlan(_render_macros_for_parse(sql)).toJSON())
    mapping = _select_mapping(tree, {}, schemas)
    return [
        ColumnLineage(output_table, out_col, t, c, tuple(chain))
        for out_col, edges in mapping.items()
        for (t, c, chain) in edges
    ]


# ---------------------------------------------------------------------------
# definition-level lineage
# ---------------------------------------------------------------------------


def query_lineage(
    spark: SparkSession,
    q: Query,
    input_table: str,
    output_table: str,
    input_columns: Iterable[str] = (),
) -> list[ColumnLineage]:
    """Edges for a declarative scan (Query.selects over the raw table).
    ``selects=None`` passes every known input column through."""
    edges: list[ColumnLineage] = []
    if q.selects is None:
        for c in input_columns:
            edges.append(ColumnLineage(output_table, c, input_table, c))
        return edges
    for out_col, expr in q.selects.items():
        for in_col, chains in expression_inputs(spark, expr).items():
            cols = list(input_columns) if in_col == "*" else [in_col]
            for c in cols:
                for chain in chains:
                    edges.append(ColumnLineage(output_table, out_col, input_table, c, chain))
    return edges


def group_by_lineage(
    spark: SparkSession,
    gb: GroupBy,
    input_table: str,
    output_table: str | None = None,
) -> list[ColumnLineage]:
    """Edges for one GroupBy's aggregation + derivation stages. The input
    namespace is the (post-select) source frame; the output namespace is the
    backfill table (reference parse_group_by: build_aggregate_sql +
    build_gb_derive_sql)."""
    output_table = output_table or gb.name
    edges: list[ColumnLineage] = []
    agg_cols: list[str] = list(gb.keys)
    for k in gb.keys:
        edges.append(ColumnLineage(output_table, k, input_table, k))
    if gb.aggregations is None:
        # selection GroupBy: snapshot's non-key fields pass through; the
        # schema isn't known from the definition alone — callers with a
        # frame can add passthrough edges via query_lineage(selects=None)
        return edges
    for a in gb.aggregations:
        for w, b in a.unpacked():
            name = a.output_name(w, b)
            agg_cols.append(name)
            chain = [a.operation.value]
            if w is not None:
                chain.append(f"window_{w.suffix}")
            edges.append(
                ColumnLineage(output_table, name, input_table, a.input_column, tuple(chain))
            )
            if b is not None:
                edges.append(
                    ColumnLineage(output_table, name, input_table, b, (a.operation.value, "bucket"))
                )
            if w is not None or a.operation.value.startswith("time_decayed"):
                # windowed/decayed outputs also observe the event time
                edges.append(
                    ColumnLineage(
                        output_table, name, input_table, gb.time_column,
                        (a.operation.value, "event_time"),
                    )
                )
    if not gb.derivations:
        return edges
    # derivations re-select over the post-agg namespace; '*' passes every
    # non-shadowed aggregate output through (operators/groupby.py:103)
    by_out: dict[str, list[ColumnLineage]] = {}
    for e in edges:
        by_out.setdefault(e.output_column, []).append(e)

    derived: list[ColumnLineage] = []
    for out_col, expr in gb.derivations.items():
        if out_col == "*":
            shadowed = set(gb.derivations) - {"*"}
            for c in agg_cols:
                if c not in shadowed:
                    for base in by_out.get(c, []):
                        derived.append(base)
            continue
        for in_col, chains in expression_inputs(spark, expr).items():
            bases = by_out.get(in_col)
            for chain in chains:
                if bases:
                    # compose: derivation chain applied on top of agg chain
                    for base in bases:
                        derived.append(
                            ColumnLineage(
                                output_table, out_col, base.input_table,
                                base.input_column, chain + base.transforms,
                            )
                        )
                else:  # derivation over a raw (non-agg) column, e.g. keys
                    derived.append(
                        ColumnLineage(output_table, out_col, input_table, in_col, chain)
                    )
    if "*" not in gb.derivations:
        # explicit derivations REPLACE the select list — keys survive
        derived.extend(e for k in gb.keys for e in by_out.get(k, []))
    return list(dict.fromkeys(derived))


def join_lineage(
    spark: SparkSession,
    join: Join,
    left_table: str,
    left_columns: Iterable[str] = (),
    sources: dict[str, str] | None = None,
    output_table: str | None = None,
) -> list[ColumnLineage]:
    """Edges for a Join's output (reference parse_join / build_join_sql):
    left columns pass through; each part contributes its GroupBy lineage
    under the part prefix with key-mapping flips; external parts contribute
    ``ext[_prefix]_{source}_{field}`` columns from their serving source."""
    output_table = output_table or join.name
    sources = sources or {}
    edges: list[ColumnLineage] = []
    for c in set(left_columns) | {*join.left_keys, join.time_column}:
        edges.append(ColumnLineage(output_table, c, left_table, c))
    for part in join.join_parts:
        gb = part.group_by
        src = sources.get(gb.name, f"source:{gb.name}")
        prefix = part.full_prefix()
        part_table = f"{output_table}__{prefix}"
        for e in group_by_lineage(spark, gb, src, output_table=part_table):
            if e.output_column in gb.keys:
                # key columns come from the LEFT under the flipped name
                inv = {v: k for k, v in part.key_mapping.items()}
                left_col = inv.get(e.output_column, e.output_column)
                edges.append(
                    ColumnLineage(
                        output_table, left_col, left_table, left_col, e.transforms
                    )
                )
            else:
                edges.append(
                    ColumnLineage(
                        output_table, f"{prefix}_{e.output_column}",
                        e.input_table, e.input_column, e.transforms,
                    )
                )
    for ext in join.external_parts:
        full = ext.full_name()
        ext_table = f"external:{ext.source.name}"
        if ext.source.is_contextual:
            for left_name, _t in ext.key_schema_full():
                edges.append(
                    ColumnLineage(output_table, f"{full}_{left_name}", left_table, left_name)
                )
            continue
        for fname, _t in ext.source.value_schema:
            edges.append(ColumnLineage(output_table, f"{full}_{fname}", ext_table, fname))
            for k, _kt in ext.source.key_schema:
                inv = {v: k2 for k2, v in ext.key_mapping.items()}
                edges.append(
                    ColumnLineage(
                        output_table, f"{full}_{fname}", left_table, inv.get(k, k), ("lookup_key",)
                    )
                )
    return list(dict.fromkeys(edges))


# ---------------------------------------------------------------------------
# metadata container (reference LineageMetaData, trimmed to what the CLI
# exports: edges + per-table column inventory)
# ---------------------------------------------------------------------------


@dataclass
class LineageMetaData:
    edges: list[ColumnLineage] = field(default_factory=list)

    def store(self, edges: Iterable[ColumnLineage]) -> None:
        seen = set(self.edges)
        for e in edges:
            if e not in seen:
                self.edges.append(e)
                seen.add(e)

    def tables(self) -> dict[str, list]:
        out: dict[str, set] = {}
        for e in self.edges:
            out.setdefault(e.output_table, set()).add(e.output_column)
            out.setdefault(e.input_table, set()).add(e.input_column)
        return {t: sorted(cols) for t, cols in sorted(out.items())}

    def inputs_of(self, table: str, column: str) -> list[ColumnLineage]:
        return [e for e in self.edges if e.output_table == table and e.output_column == column]

    def as_dict(self) -> dict:
        return {
            "edges": [e.as_dict() for e in self.edges],
            "tables": self.tables(),
        }
