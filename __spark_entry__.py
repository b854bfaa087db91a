"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 plus the datapipe operators, cross-checked against
DuckDB at sf0.01 (see mdq_spark/entry_queries.py for the registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build (or resume) the Xapian-mode inverted index over
    /root/testdata/sf0.001 documents and run a mixed free-text +
    field-scoped BM25 top-10, materializing winners against the forward
    store."""
    from pyspark.sql import functions as F
    from mdq_spark.entry_queries import ensure_index

    s = ensure_index(spark, "/root/testdata/sf0.001", "xapian")
    topk = s.query_df("sort merge tag:en join", k=10)
    return s.fetch(topk, columns=("doc_id", "fullpath", "title"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mdq_spark.entry_queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from mdq_spark.entry_queries import oracle_sql as _o
    return _o()
