"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full 13-stage extraction over the
deterministic fixture corpus).  ``queries()`` exposes every implemented
operator from SURVEY.md §2 plus the training-data-pipeline ops;
``oracle_sql()`` provides the DuckDB equivalents (the extraction query's
oracle is a VALUES table of intent-level goldens).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: byte-identical text extraction over the fixture corpus."""
    from pdftotext_plus_plus_spark.datapipe import registry

    return registry.extract_text(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdftotext_plus_plus_spark.datapipe import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from pdftotext_plus_plus_spark.datapipe import registry

    return registry.oracle_sql()
