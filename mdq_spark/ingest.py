"""Sources: external tables -> the engine's docs DataFrame (SURVEY.md §2.1).

S1/S2 re-expressed Spark-first: the graft input is already tabular
(Iceberg-shaped ``(repo, path, commit, lang, content)``; parquet stands
in for Iceberg in this sandbox — same scan/pushdown semantics), so the
reference's directory walk becomes a table scan and the frontmatter
parse becomes an Arrow-batched mapInPandas kernel.  A raw-file mode
(``spark.read.format('text') wholetext``) covers the reference's actual
on-disk layout for .md corpora.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from .build import DOCS_SCHEMA
from .corpus import (
    FrontmatterError,
    doc_from_code_row,
    doc_from_documents_row,
    doc_from_markdown,
)

_DOC_KEYS = [f.name for f in DOCS_SCHEMA.fields]


def _project(doc: dict) -> dict:
    return {k: doc.get(k) for k in _DOC_KEYS}


def docs_from_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provided ``documents.parquet`` -> docs DataFrame.

    The table carries a dense 0-based doc_id already; the adapter shifts
    it to 1-based (Xapian docids start at 1)."""
    src = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _project(doc_from_documents_row(
                    r.doc_id, r.text, r.lang, r.source))
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(rows, columns=_DOC_KEYS)

    return src.select("doc_id", "text", "lang", "source") \
        .mapInPandas(fn, schema=DOCS_SCHEMA)


def docs_from_code_table(spark: SparkSession, code_df: DataFrame,
                         id_offset: int = 1) -> DataFrame:
    """input_hint shape ``(repo, path, commit, lang, content)`` -> docs.

    Dense deterministic doc_ids are assigned by (repo, path) order — the
    upsert key, mirroring the reference's ``Q`` + fullpath identity term
    (src/document.rs:185-187).  Uses sort + zipWithIndex (one extra
    count-per-partition pass; the scale-safe dense-id idiom — a single
    global window would serialize on one partition).
    """
    ordered = code_df.select("repo", "path", "commit", "lang", "content") \
        .repartitionByRange(code_df.rdd.getNumPartitions() or 1,
                            "repo", "path") \
        .sortWithinPartitions("repo", "path")

    def to_doc(pair):
        row, idx = pair
        d = doc_from_code_row(idx + id_offset, row.repo, row.path,
                              row.commit, row.lang, row.content)
        return Row(**_project(d))

    rdd = ordered.rdd.zipWithIndex().map(to_doc)
    return spark.createDataFrame(rdd, schema=DOCS_SCHEMA)


def code_table_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape the driver ``documents`` table into the
    input_hint code-corpus shape (repo, path, commit, lang, content) —
    used by tests/bench so the input_hint ingest path is exercised
    without external data."""
    src = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    return src.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"),
                 F.lit(".md")).alias("path"),
        F.sha2(F.concat_ws("/", "source", F.col("doc_id").cast("string")),
               256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def docs_from_markdown_files(spark: SparkSession, root: str) -> DataFrame:
    """Raw-file mode: recursive walk over ``*.md`` with the reference's
    predicates (skip dotfiles P1, keep .md P2 — src/main.rs:84-97), parse
    frontmatter, skip unparseable files with a warning like the
    reference (src/main.rs:101-106)."""
    files = (spark.read.format("text")
             .option("wholetext", "true")
             .option("recursiveFileLookup", "true")
             .option("pathGlobFilter", "*.md")
             .load(root)
             .withColumn("fullpath", F.input_file_name())
             .filter(~F.col("fullpath").rlike(r"/\.")))

    ordered = files.repartitionByRange(
        files.rdd.getNumPartitions() or 1, "fullpath") \
        .sortWithinPartitions("fullpath")

    def to_doc(pair):
        row, idx = pair
        try:
            d = doc_from_markdown(idx + 1, row.fullpath, row.value)
        except FrontmatterError:
            return None
        return Row(**_project(d))

    rdd = ordered.rdd.zipWithIndex().map(to_doc).filter(lambda r: r)
    return spark.createDataFrame(rdd, schema=DOCS_SCHEMA)
