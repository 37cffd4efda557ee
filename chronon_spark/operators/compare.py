"""DataFrame comparison / diff — the reference's test comparator as a
first-class operator (spark/src/main/scala/ai/chronon/spark/Comparison.scala:
27-122 sideBySide): full-outer join two frames on keys, emit rows where any
non-key column differs (floats compared with tolerance, complex values via
canonical JSON strings)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(col, dtype):
    t = dtype.typeName()
    if t == "double" or t == "float":
        return F.round(col.cast("double"), 6)
    if t in ("map", "array", "struct"):
        return F.to_json(col)
    return col


def side_by_side(
    a: DataFrame, b: DataFrame, keys: list[str], a_name: str = "a", b_name: str = "b"
) -> DataFrame:
    """Rows where the two frames disagree: one output row per differing key
    with both sides' values column-by-column (prefixed {a,b}_name)."""
    val_cols = [f.name for f in a.schema.fields if f.name not in keys]
    an = a.select(
        *keys, *[_canon(F.col(c), a.schema[c].dataType).alias(f"{a_name}_{c}") for c in val_cols]
    )
    bn = b.select(
        *keys, *[_canon(F.col(c), b.schema[c].dataType).alias(f"{b_name}_{c}") for c in val_cols]
    )
    j = an.join(bn, keys, "full")
    diff_cond = None
    for c in val_cols:
        neq = ~F.col(f"{a_name}_{c}").eqNullSafe(F.col(f"{b_name}_{c}"))
        diff_cond = neq if diff_cond is None else (diff_cond | neq)
    return j.where(diff_cond) if diff_cond is not None else j.limit(0)


def assert_equal(a: DataFrame, b: DataFrame, keys: list[str]) -> None:
    d = side_by_side(a, b, keys)
    n = d.count()
    if n:
        sample = d.limit(5).collect()
        raise AssertionError(f"{n} differing rows; first: {sample}")
