"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (protect -> unprotect -> verify
aggregate) on sf0.001. ``queries()`` / ``oracle_sql()`` expose every
operator registered in
``databatchprotectionservice_spark.plans.registry`` — the engine's full
query surface with DuckDB oracles for the SQL-expressible ones.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databatchprotectionservice_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # make sure executor python workers can import the package
    repo = os.path.dirname(os.path.abspath(__file__))
    existing = os.environ.get("PYTHONPATH", "")
    if repo not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo}{os.pathsep}{existing}" if existing else repo
        )
    from databatchprotectionservice_spark.operators.protection import (
        protect_roundtrip_lineitem,
    )

    return protect_roundtrip_lineitem(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query."""
    return registry.all_oracles()
