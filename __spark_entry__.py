"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001
queries()     -> name -> (spark, sf_dir) -> DataFrame, one per operator
                 implemented from SURVEY.md §2 (see dexspark/queries.py)
oracle_sql()  -> name -> ANSI SQL for DuckDB over the same parquet views
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dexspark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-ish pricing summary at sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
