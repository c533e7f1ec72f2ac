"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (wave selection, the crawl engine's O1/O7
shape) on sf0.001. ``queries()``/``oracle_sql()`` — one entry per operator
from SURVEY.md §2 + the training-data ops; the driver compares each Spark
result against the DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: salted-window wave selection (SURVEY.md §2 O1/O7 analogue)."""
    from monocator_spark.queries import REGISTRY

    fn, _ = REGISTRY["wave_select_rank"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from monocator_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from monocator_spark.queries import oracle_sql as _o

    return _o()
