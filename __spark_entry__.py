"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``data_ingestion_worker_spark.registry``: the engine's
operator inventory (SURVEY.md §2 + scale extensions) lives there, one
(PySpark fn, DuckDB oracle SQL) pair per operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_worker_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's whole
    initial-validation lifecycle (processor.py:124-388) as one DataFrame
    plan — F1-F6 scalar rules, A1 duplicate window, J2/J3 membership
    joins, F5 row identity hash."""
    from data_ingestion_worker_spark.operators.relational import (
        contacts_validation,
    )

    return contacts_validation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
