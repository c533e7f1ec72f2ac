"""Driver-surface query registry.

Each entry maps a SURVEY.md §2 operator (or training-data-pipeline op) to a
(spark_fn, oracle_sql) pair. spark_fn(spark, sf_dir) → DataFrame; oracle_sql
is DuckDB dialect over the same parquet views. Column names and types are
aligned pairwise — the driver hash-compares values after sorting columns by
name.
"""

from monocator_spark.queries.crawlops import CRAWLOPS
from monocator_spark.queries.imaging import IMAGING
from monocator_spark.queries.relational import RELATIONAL
from monocator_spark.queries.similarity import SIMILARITY
from monocator_spark.queries.streamingops import STREAMING
from monocator_spark.queries.textops import TEXTOPS

REGISTRY: dict[str, tuple] = {}
for part in (RELATIONAL, TEXTOPS, SIMILARITY, IMAGING, STREAMING, CRAWLOPS):
    REGISTRY.update(part)


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
