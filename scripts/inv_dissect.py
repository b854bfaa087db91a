#!/usr/bin/env python
"""Dissect the inversion stage's cost on an existing terms staging.

Times, at a given core count, on the same staged input:

  sort    — JVM sortWithinPartitions(term, block, doc_id) alone
            (kernel replaced by a row-count pass-through)
  encode  — sort + map-side _encode_runs, no shuffle/merge (noop sink)
  full    — the complete invert_postings (encode + shuffle + merge)
            written to a throwaway parquet dir

Usage: python scripts/inv_dissect.py <index_dir_with_terms> [cores]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    idx = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from pyspark.sql import functions as F
    from mdq_spark import bm25
    from mdq_spark.build import (
        POSTINGS_SCHEMA, IndexBuilder, _encode_runs, invert_postings,
    )
    from mdq_spark.session import get_spark

    spark = get_spark("inv-dissect", cores=cores,
                      shuffle_partitions=cores)
    # one Python worker per core warmed
    (spark.range(cores * 4, numPartitions=cores)
     .mapInPandas(lambda it: it, "id long").count())

    b = IndexBuilder(spark, idx)
    terms = b._read_staged(os.path.join(idx, "terms"))
    src = terms.filter(F.col("gen") == 0).drop("bucket")
    import json
    gs = json.load(open(os.path.join(idx, "manifest.json")))["globalstats"]
    lf = bm25.len_factor(float(gs["avg_doclen"] or 0.0))
    n_parts = src.rdd.getNumPartitions()

    def pass_through():
        import pyarrow as pa

        def fn(batches):
            n = 0
            for batch in batches:
                n += batch.num_rows
            yield pa.record_batch([pa.array([n])], names=["n"])
        return fn

    out: dict = {"cores": cores, "splits": n_parts}
    print(json.dumps(out), flush=True)

    t0 = time.time()
    (src.mapInArrow(pass_through(), "n long")
     .write.format("noop").mode("overwrite").save())
    out["scan_only_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)

    t0 = time.time()
    (src.sortWithinPartitions("term", "block", "doc_id")
     .mapInArrow(pass_through(), "n long")
     .write.format("noop").mode("overwrite").save())
    out["sort_only_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)

    t0 = time.time()
    (src.sortWithinPartitions("term", "block", "doc_id")
     .mapInArrow(_encode_runs(lf, 64), schema=POSTINGS_SCHEMA)
     .write.format("noop").mode("overwrite").save())
    out["sort_encode_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)

    tmp = os.path.join(REPO, "_idx_cache", "_inv_dissect_out")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.time()
    invert_postings(src, lf, 64).write.mode("overwrite") \
        .partitionBy("bucket").parquet(tmp)
    out["full_sec"] = round(time.time() - t0, 1)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
