#!/usr/bin/env python
"""Dissect per-query latency on an existing index.

For each headline query, times the pieces a single query pays:

  parse      — parse_user_query alone (driver, no Spark)
  dict       — Searcher._dict_lookup (the one bounded collect)
  plan       — build the result DataFrame, no action (planning only)
  exec       — full query_df(...).collect()
  exec_warm  — the same collect again (JIT/codegen/cache warm)

and reports the posting-scan parallelism the plan actually got
(numPartitions at the scan and at the kernel exchange), so poor
core-scaling can be attributed to task-count starvation vs fixed
driver-side cost vs real work.

Usage: python scripts/query_dissect.py <index_dir> [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = {
    "q1_free_text": "sort merge join",
    "q2_field_scoped": "tag:en sort",
    "q3_phrase": '"the fast" ',
    "q4_boolean": "sort AND NOT merge",
    "q5_and_maybe": "sort AND MAYBE merge",
    "q6_partial": "sor* merge",
    "q7_filtered": "tag:en AND sort",
}


def main() -> None:
    idx = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from mdq_spark.queryparse import parse_user_query
    from mdq_spark.search import Searcher
    from mdq_spark.session import ensure_worker_imports, get_spark

    spark = get_spark("query-dissect", cores=cores,
                      shuffle_partitions=cores)
    ensure_worker_imports(spark)
    (spark.range(cores * 4, numPartitions=cores)
     .mapInPandas(lambda it: it, "id long").count())
    s = Searcher(spark, idx)

    out = {"cores": cores, "index": idx, "queries": {}}
    for name, q in QUERIES.items():
        r: dict = {}
        t0 = time.time()
        node = parse_user_query(q)
        r["parse_ms"] = round((time.time() - t0) * 1000, 1)

        terms: set = set()
        pats: set = set()
        Searcher._walk(node, terms, pats)
        t0 = time.time()
        s._dict_lookup(sorted(terms), sorted(pats))
        r["dict_s"] = round(time.time() - t0, 3)

        t0 = time.time()
        df = s.query_df(q, k=10)
        r["plan_s"] = round(time.time() - t0, 3)

        t0 = time.time()
        rows = df.collect()
        r["exec_s"] = round(time.time() - t0, 3)
        r["rows"] = len(rows)

        t0 = time.time()
        s.query_df(q, k=10).collect()
        r["exec_warm_s"] = round(time.time() - t0, 3)

        out["queries"][name] = r
        print(json.dumps({name: r}), flush=True)

    # posting-scan parallelism for the widest query (q1): how many
    # tasks does the pruned scan get before the kernel exchange?
    terms, pats = set(), set()
    Searcher._walk(parse_user_query(QUERIES["q1_free_text"]), terms, pats)
    got = s._dict_lookup(sorted(terms), sorted(pats))
    scan = s._scan_blocks([d["term"] for d in got["exact"].values()]
                          or sorted(terms))
    out["q1_scan_partitions"] = scan.rdd.getNumPartitions()
    out["shuffle_partitions"] = int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
