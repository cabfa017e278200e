"""Shared column expressions.

All JVM-side built-ins (whole-stage-codegen friendly); no Python UDFs.
Several helpers exist to make results *bit-identical* across engines so
the DuckDB oracle hash-matches:

- ``decimal_sum``: double sums are order-dependent in IEEE arithmetic; a
  parallel Spark sum and a serial DuckDB sum can differ in the last ulp.
  Summing after a cast to DECIMAL(38,6) is exact and order-independent,
  and the final decimal->double cast is deterministic on both engines.
- ``dot``/``cosine_similarity``: strict left-fold over the array in index
  order (F.aggregate), matching a sequential list reduction in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def epoch_ms(col: Column | str) -> Column:
    """Timestamp -> epoch milliseconds (UTC session tz pinned)."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def window_start_ms(col: Column | str, width_ms: int, offset_ms: int = 0) -> Column:
    """Aligned tumbling-window start in epoch-ms (integer arithmetic)."""
    ms = epoch_ms(col)
    return (F.floor((ms - offset_ms) / F.lit(width_ms)) * width_ms + offset_ms).cast("long")


def decimal_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent sum of a double column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns, left-fold in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product unrolled to a flat codegen expression (known dim).

    Bit-identical to ``dot``: the sum is left-associative in index order,
    so IEEE addition order matches the fold (``(((p1+p2)+p3)...)`` vs
    ``(((0.0+p1)+p2)...)`` — identical bit patterns for non-zero
    products). Unlike the higher-order-function fold, which Spark
    interprets per element, this is one whole-stage-codegen expression —
    measured ~30x faster on quadratic pair-scoring paths.

    Pass COLUMN NAMES (str) on hot paths: the expression is then built
    as ONE ``F.expr`` SQL string (a single py4j round-trip) instead of
    ~4*dim Column-object calls — measured ~0.5 s of pure plan-building
    py4j overhead per 64-dim call otherwise. SQL ``+`` parses
    left-associative, so the tree is identical either way.
    """
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(" + ".join(
            f"CAST(element_at(`{a}`, {i}) AS DOUBLE)"
            f" * CAST(element_at(`{b}`, {i}) AS DOUBLE)"
            for i in range(1, dim + 1)))
    terms = [F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
             for i in range(1, dim + 1)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _double_sql(w: float) -> str:
    """A SQL double literal with the exact value of the Python float
    (repr round-trips; the D suffix keeps the parser off DECIMAL)."""
    return f"{float(w)!r}D"


def dot_literal(a: Column | str, weights: list[float]) -> Column:
    """Dot of an array column with a Python-side constant vector.

    Left-associative in index order (same IEEE order as the fold the
    oracle uses); constants fold into the codegen expression. As with
    ``dot_unrolled``, pass the column NAME to build the whole thing as
    one ``F.expr`` string.
    """
    if isinstance(a, str):
        return F.expr(dot_literal_sql(a, weights))
    terms = [F.element_at(a, i + 1).cast("double") * F.lit(float(w))
             for i, w in enumerate(weights)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_literal_sql(a: str, weights: list[float]) -> str:
    """SQL-string form of ``dot_literal`` over column name ``a``."""
    return " + ".join(
        f"CAST(element_at(`{a}`, {i + 1}) AS DOUBLE) * {_double_sql(w)}"
        for i, w in enumerate(weights))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hex_to_long(col: Column, start: int = 1, length: int = 15) -> Column:
    """Parse a hex substring (e.g. of md5) to a non-negative BIGINT.

    <= 15 hex digits so the value fits in int64 without sign issues; the
    DuckDB twin is ``('0x' || substr(h, start, length))::BIGINT``.
    """
    return F.conv(F.substring(col, start, length), 16, 10).cast("long")
