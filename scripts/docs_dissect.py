#!/usr/bin/env python
"""Dissect the forward-store (docs) stage cost at a given sf dir
(round-6 §2 evidence; guide §1.4 noop-sink methodology).

Times, on a warmed session:

  getNumPartitions — the DF->RDD partition probe alone
  check-job        — the _ranges_disjoint column-pruned pass
  scan+sha2        — the ingest projection, noop sink
  range+sort noop  — + the range exchange and local sort
  write (implicit) — full stage with repartitionByRange("doc_id")
  write (explicit) — full stage with repartitionByRange(2*par, ...)

Usage: python scripts/docs_dissect.py [sf_dir] [cores]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F
    from mdq_spark.ingest import docs_from_documents_table
    from mdq_spark.session import ensure_worker_imports, get_spark

    spark = get_spark("docs-dissect", cores=cores,
                      shuffle_partitions=cores)
    ensure_worker_imports(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = docs_from_documents_table(spark, sf_dir)
    par = max(spark.sparkContext.defaultParallelism, 1)

    def t(label, fn):
        t0 = time.time()
        fn()
        print(f"{label}: {time.time() - t0:.3f}s", flush=True)

    t("getNumPartitions", lambda: docs.rdd.getNumPartitions())
    t("check-job", lambda: docs.select("doc_id")
      .groupBy(F.spark_partition_id()).agg(F.count("doc_id")).collect())
    t("scan+sha2 noop", lambda: docs.write.format("noop")
      .mode("overwrite").save())
    t("range+sort noop", lambda: docs.repartitionByRange("doc_id")
      .sortWithinPartitions("doc_id").write.format("noop")
      .mode("overwrite").save())
    tmp = tempfile.mkdtemp(prefix="docs_dissect_")
    try:
        t("full write (implicit count)",
          lambda: docs.repartitionByRange("doc_id")
          .sortWithinPartitions("doc_id").withColumn("gen", F.lit(0))
          .write.mode("overwrite")
          .option("parquet.block.size", str(8 << 20))
          .parquet(os.path.join(tmp, "a")))
        t(f"full write (explicit {par * 2})",
          lambda: docs.repartitionByRange(par * 2, "doc_id")
          .sortWithinPartitions("doc_id").withColumn("gen", F.lit(0))
          .write.mode("overwrite")
          .option("parquet.block.size", str(8 << 20))
          .parquet(os.path.join(tmp, "b")))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
