"""Query registry plumbing.

Each judged capability is a ``Query``: a Spark callable (spark, sf_dir)
-> DataFrame plus (when SQL-expressible) the equivalent DuckDB oracle
SQL over the driver's pre-registered views. Column names/types are
aligned on both sides so the driver's order-insensitive value hash
matches; engine-portable numerics (decimal sums, in-order array folds,
integer window arithmetic) are used throughout — see
functions.scalars for why.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check
    description: str = ""
