"""Sources: external tables -> the engine's docs DataFrame (SURVEY.md §2.1).

S1/S2 re-expressed Spark-first: the graft input is already tabular
(Iceberg-shaped ``(repo, path, commit, lang, content)``; parquet stands
in for Iceberg in this sandbox — same scan/pushdown semantics), so the
reference's directory walk becomes a table scan and the frontmatter
parse becomes an Arrow-batched mapInPandas kernel.  A raw-file mode
(``spark.read.format('text') wholetext``) covers the reference's actual
on-disk layout for .md corpora.

Dense doc-id assignment (VERDICT r02 #2) is DataFrame-native: range-
repartition on the ordering key, pin the partitioning with a local
checkpoint, collect only the per-partition COUNTS (a handful of ints,
never rows), and add ``offset + arange`` inside an Arrow kernel — no
``.rdd``, no per-row Python, no full-row rebuild.  The tabular adapters
(code table, documents table) are pure native column expressions; only
the markdown frontmatter parser runs Python, Arrow-batched.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .build import DOCS_SCHEMA
from .corpus import FrontmatterError, doc_from_markdown

_DOC_KEYS = [f.name for f in DOCS_SCHEMA.fields]


def dense_ids(df: DataFrame, order_cols: list[str],
              id_offset: int = 1, id_col: str = "doc_id") -> DataFrame:
    """Assign dense ``id_offset``-based ids in global ``order_cols``
    order, JVM/Arrow-side end to end (the scale-safe replacement for
    sort + zipWithIndex + per-row Row rebuild, VERDICT r02 #2):

    1. range-repartition + in-partition sort on the ordering key;
    2. ``localCheckpoint`` pins the sampled range boundaries so the
       counting job and the consuming job see the SAME partitions (and
       the expensive shuffle runs once);
    3. one tiny aggregation collects per-partition row counts — the
       only driver-side data is one int per partition;
    4. an Arrow kernel prepends ``partition_offset + arange`` per
       batch — vectorized, no per-row Python.

    On a multi-executor cluster, swap the (non-replicated)
    ``localCheckpoint`` for ``df.checkpoint()`` against a reliable
    checkpoint dir if executor loss during ingest must be survivable —
    the partition-pinning requirement is the same either way.
    """
    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 1)
    ordered = (df.repartitionByRange(n, *order_cols)
               .sortWithinPartitions(*order_cols)
               .localCheckpoint())
    with_pid = ordered.withColumn("_pid", F.spark_partition_id())
    counts = with_pid.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = int(id_offset)
    for r in sorted(counts, key=lambda x: x["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["count"])
    b = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        [StructField(id_col, LongType(), False)] + ordered.schema.fields)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        start = None
        used = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if start is None:
                start = b.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf.insert(0, id_col, np.arange(
                start + used, start + used + len(pdf), dtype="int64"))
            used += len(pdf)
            yield pdf

    return with_pid.mapInPandas(assign, schema=out_schema)


def _doc_shape(df: DataFrame) -> DataFrame:
    """Project to the canonical DOCS_SCHEMA column order + types."""
    return df.select(*[F.col(f.name).cast(f.dataType)
                       for f in DOCS_SCHEMA.fields])


def docs_from_documents_table(spark: SparkSession, sf_dir: str,
                              src_df: DataFrame | None = None) -> DataFrame:
    """Driver-provided ``documents.parquet`` -> docs DataFrame, pure
    native column expressions (no Python in the ingest hot path —
    VERDICT r02 #2; semantics of corpus.doc_from_documents_row).

    The table carries a dense 0-based doc_id already; the adapter shifts
    it to 1-based (Xapian docids start at 1).  ``src_df`` substitutes a
    pre-transformed documents DataFrame (same columns) for the parquet
    read — used by the CJK gate entry, which augments ``text`` first."""
    src = src_df if src_df is not None else \
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    text = F.coalesce(F.col("text"), F.lit(""))
    # title = ' '.join(text.split()[:4]): strip outer whitespace so
    # split never yields leading/trailing empty tokens (python .split()
    # parity, including tabs/newlines which F.trim would miss)
    words = F.split(F.regexp_replace(text, r"^\s+|\s+$", ""), r"\s+")
    return _doc_shape(src.select(
        (F.col("doc_id") + 1).cast("long").alias("doc_id"),
        F.concat(F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string"), F.lit(".md"))
        .alias("fullpath"),
        F.array_join(F.slice(words, 1, 4), " ").alias("title"),
        F.lit("").alias("subtitle"),
        F.array(F.col("source")).alias("authors"),
        (F.lit(1600000000) + F.col("doc_id").cast("long") * 3600)
        .alias("date"),
        F.when(F.col("lang").isNotNull() & (F.col("lang") != ""),
               F.array(F.col("lang")))
        .otherwise(F.array().cast("array<string>")).alias("tags"),
        F.lit(0).alias("weight"),
        F.lit(0).alias("writes"),
        F.lit(0).alias("views"),
        text.alias("body"),
        F.sha2(text, 256).alias("sha256"),
    ))


def docs_from_code_table(spark: SparkSession, code_df: DataFrame,
                         id_offset: int = 1) -> DataFrame:
    """input_hint shape ``(repo, path, commit, lang, content)`` -> docs,
    pure native column expressions + DataFrame-native dense ids.

    Dense deterministic doc_ids are assigned by (repo, path) order — the
    upsert key, mirroring the reference's ``Q`` + fullpath identity term
    (src/document.rs:185-187).  Semantics of corpus.doc_from_code_row
    (the pure-Python twin used by the oracle): the commit's first 8 hex
    chars drive a deterministic pseudo-date so date predicates are
    testable without external data.
    """
    content = F.coalesce(F.col("content"), F.lit(""))
    c8 = F.substring(F.coalesce(F.col("commit"), F.lit("0")), 1, 8)
    commit_num = F.when(c8.rlike("^[0-9a-fA-F]+$"),
                        F.conv(c8, 16, 10).cast("long")).otherwise(0)
    # ordering keys ride along so dense_ids really orders by
    # (repo, path) — NOT by the fullpath string, which flips when repo
    # names share a prefix ('org/alpha-x' vs 'org/alpha': '-' < '/')
    # (ADVICE r03); _doc_shape projects them away afterwards
    shaped = code_df.select(
        F.col("repo").alias("_ord_repo"),
        F.col("path").alias("_ord_path"),
        F.concat(F.col("repo"), F.lit("/"), F.col("path"))
        .alias("fullpath"),
        F.element_at(F.split(F.coalesce(F.col("path"), F.lit("")), "/"), -1)
        .alias("title"),
        F.lit("").alias("subtitle"),
        F.when(F.col("repo").isNotNull() & (F.col("repo") != ""),
               F.array(F.col("repo")))
        .otherwise(F.array().cast("array<string>")).alias("authors"),
        (F.lit(1577836800) + commit_num % (86400 * 1000)).alias("date"),
        F.when(F.col("lang").isNotNull() & (F.col("lang") != ""),
               F.array(F.col("lang")))
        .otherwise(F.array().cast("array<string>")).alias("tags"),
        F.lit(0).alias("weight"),
        F.lit(0).alias("writes"),
        F.lit(0).alias("views"),
        content.alias("body"),
        F.sha2(content, 256).alias("sha256"),
    )
    return _doc_shape(dense_ids(shaped, ["_ord_repo", "_ord_path"],
                                id_offset))


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
    reference (src/main.rs:101-106).

    The YAML-subset frontmatter parse is genuinely per-document Python
    (the one place ingest needs it) and runs Arrow-batched in
    mapInPandas; id assignment is the shared DataFrame-native helper,
    run AFTER the parse so ids are dense over the parseable files."""
    files = (spark.read.format("text")
             .option("wholetext", "true")
             .option("recursiveFileLookup", "true")
             .option("pathGlobFilter", "*.md")
             .load(root)
             .withColumn("fullpath", F.input_file_name())
             .filter(~F.col("fullpath").rlike(r"/\.")))

    parse_keys = [k for k in _DOC_KEYS if k != "doc_id"]
    parse_schema = StructType(
        [f for f in DOCS_SCHEMA.fields if f.name != "doc_id"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    d = doc_from_markdown(0, r.fullpath, r.value)
                except FrontmatterError:
                    continue
                rows.append({k: d.get(k) for k in parse_keys})
            yield pd.DataFrame(rows, columns=parse_keys)

    parsed = files.mapInPandas(parse, schema=parse_schema)
    return _doc_shape(dense_ids(parsed, ["fullpath"]))
