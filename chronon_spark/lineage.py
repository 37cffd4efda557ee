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
