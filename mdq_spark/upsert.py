"""Incremental upsert — the reference's ``replace_document`` + commit
re-expressed for a distributed index (SURVEY.md S3/S4).

The reference upserts by identity term ``Q + fullpath``
(/root/reference/src/document.rs:185-188) with one commit per batch
(src/main.rs:110).  Here a batch upsert is:

1. docs whose ``fullpath`` matches an incoming row are *tombstoned*
   (their doc_ids recorded; old posting blocks are never rewritten);
2. incoming docs get fresh doc_ids past the old maximum, so their
   posting blocks land in brand-new doc-range blocks — appends only;
3. the new batch's postings/dict/docstats/docs parquet files are
   appended to the same directories;
4. *negative* dictionary deltas for the tombstoned docs (computed
   exactly from the terms staging — the checkpoint pays off) go to
   ``dict_delta/`` so df/cf stay exact without rewriting ``dict/``;
5. ``globalstats`` is recomputed exactly from docstats minus tombstones;
6. the manifest records the new generation (the "commit").

Query-side (search.py) merges dict rows + deltas per term and anti-joins
tombstones after decode, so results equal a from-scratch rebuild of the
current corpus — asserted by tests.  ``compact()`` is the merge step
that folds tombstones away by rebuilding from the live doc set (run it
when the tombstone ratio grows).  In production the appends + manifest
write map to an Iceberg MERGE INTO + snapshot commit (SURVEY.md §1.4).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from . import bm25
from .build import (
    POSTINGS_SCHEMA, TERMS_SCHEMA, _encode_runs, _tokenize_batches,
    build_index,
)

TOMBSTONE_SCHEMA = "doc_id bigint, gen int"
DICT_DELTA_SCHEMA = "term string, bucket int, ddf bigint, dcf bigint"


def _manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _write_manifest(index_dir: str, m: dict) -> None:
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(m, f, indent=2)


def upsert(spark: SparkSession, index_dir: str,
           new_docs_df: DataFrame) -> dict:
    """Batch upsert keyed by fullpath.  ``new_docs_df`` must have the
    DOCS_SCHEMA columns except ``doc_id`` may be arbitrary (fresh ids
    are assigned here)."""
    index_dir = index_dir.rstrip("/")
    m = _manifest(index_dir)
    gen = int(m.get("generation", 0)) + 1
    block_span = int(m["block_span"])
    n_buckets = int(m["n_buckets"])
    mode = m.get("mode", "xapian")

    docs = spark.read.parquet(f"{index_dir}/docs")
    docstats = spark.read.parquet(f"{index_dir}/docstats")
    terms = spark.read.parquet(f"{index_dir}/terms")
    tomb_path = f"{index_dir}/tombstones"
    old_tombs = (spark.read.parquet(tomb_path)
                 if os.path.exists(tomb_path) else None)

    # 1. tombstone replaced fullpaths (Q+fullpath identity, S3)
    incoming_paths = new_docs_df.select("fullpath").distinct()
    live = docs
    if old_tombs is not None:
        live = live.join(old_tombs.select("doc_id"), "doc_id", "left_anti")
    tombs = live.join(incoming_paths, "fullpath", "left_semi") \
        .select("doc_id").withColumn("gen", F.lit(gen))
    tombs.write.mode("append").parquet(tomb_path)
    all_tombs = spark.read.parquet(tomb_path).select("doc_id")

    # 2. fresh dense doc_ids past the old maximum
    next_id = int(m.get("next_doc_id", 0))
    if not next_id:
        next_id = int(docs.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    ordered = new_docs_df.drop("doc_id") \
        .sortWithinPartitions("fullpath")
    cols = [c for c in docs.columns if c != "doc_id"]

    def assign(pair):
        row, idx = pair
        d = row.asDict()
        return Row(doc_id=idx + next_id,
                   **{c: d.get(c) for c in cols})
    new_docs = spark.createDataFrame(
        ordered.rdd.zipWithIndex().map(assign), schema=docs.schema)
    n_new = new_docs.count()

    # 3. append forward store + tokenized staging + postings + dict
    new_docs.write.mode("append").parquet(f"{index_dir}/docs")
    new_terms = new_docs.mapInPandas(
        _tokenize_batches(n_buckets, block_span, mode), schema=TERMS_SCHEMA)
    new_terms.write.mode("append").parquet(f"{index_dir}/terms")
    new_terms = spark.read.parquet(f"{index_dir}/terms") \
        .filter(F.col("doc_id") >= next_id)
    (new_terms.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
     .write.mode("append").parquet(f"{index_dir}/docstats"))
    (new_terms.groupBy("term", "bucket")
     .agg(F.count("doc_id").alias("df"), F.sum("wdf").alias("cf"),
          F.max("wdf").alias("wdf_max"))
     .write.mode("append").partitionBy("bucket")
     .parquet(f"{index_dir}/dict"))

    # 4. exact negative dict deltas for tombstoned docs (from staging)
    this_tombs = tombs.select("doc_id")
    neg = (terms.join(this_tombs, "doc_id", "left_semi")
           .groupBy("term", "bucket")
           .agg((-F.count("doc_id")).cast("long").alias("ddf"),
                (-F.sum("wdf")).cast("long").alias("dcf")))
    neg.write.mode("append").parquet(f"{index_dir}/dict_delta")

    # 5. exact global stats over live docs
    live_stats = spark.read.parquet(f"{index_dir}/docstats") \
        .join(all_tombs, "doc_id", "left_anti")
    gs = live_stats.agg(
        F.count("doc_id").alias("n_docs"),
        F.sum("doclen").alias("total_doclen"),
        F.min("doclen").alias("doclen_lb"),
        F.max("doclen").alias("doclen_ub")).collect()[0].asDict()
    gs["avg_doclen"] = (gs["total_doclen"] / gs["n_docs"]) \
        if gs["n_docs"] else 0.0
    spark.createDataFrame([gs]).write.mode("overwrite") \
        .parquet(f"{index_dir}/globalstats")

    # postings for the new blocks (after globalstats so lf is current)
    lf = bm25.len_factor(float(gs["avg_doclen"] or 0.0))
    (new_terms.repartition("term", "block")
     .sortWithinPartitions("term", "block", "doc_id")
     .mapInPandas(_encode_runs(lf), schema=POSTINGS_SCHEMA)
     .write.mode("append").partitionBy("bucket")
     .parquet(f"{index_dir}/postings"))

    # 6. commit
    m["generation"] = gen
    m["next_doc_id"] = next_id + n_new
    m["globalstats"] = {k: float(v) if v is not None else None
                        for k, v in gs.items()}
    m.setdefault("upserts", []).append({
        "gen": gen, "n_new": n_new, "ts": time.time(),
    })
    _write_manifest(index_dir, m)
    return m


def compact(spark: SparkSession, index_dir: str, out_dir: str) -> dict:
    """Fold tombstones away: rebuild a fresh index from the live doc
    set (the merge step; run when the tombstone ratio grows)."""
    index_dir = index_dir.rstrip("/")
    m = _manifest(index_dir)
    docs = spark.read.parquet(f"{index_dir}/docs")
    tomb_path = f"{index_dir}/tombstones"
    if os.path.exists(tomb_path):
        tombs = spark.read.parquet(tomb_path).select("doc_id")
        docs = docs.join(tombs, "doc_id", "left_anti")
    return build_index(spark, docs, out_dir, mode=m.get("mode", "xapian"),
                       block_span=int(m["block_span"]),
                       n_buckets=int(m["n_buckets"]))
