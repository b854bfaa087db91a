#!/usr/bin/env python
"""Block-max pruning effectiveness report (VERDICT r03 #4).

For each top-k query on an existing index: how many (term, block)
posting rows the plain path decodes vs how many survive the WAND bound
(seed blocks + kept set), plus both paths' wall time and a result-
identity check.  Usage:

    python scripts/prune_stats.py <index_dir> [k]

Prints one JSON line per query and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = {
    "q1_free_text": "sort merge join",
    "q2_field_scoped": "tag:en sort",
    "q6_partial": "vec",
    "q_single_hot": "the ",
    "q_or_wide": "sort merge join hash batch window ",
}


def main() -> None:
    idx = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F
    from mdq_spark.session import get_spark
    from mdq_spark.search import Searcher
    from mdq_spark.queryparse import parse_user_query

    spark = get_spark("prune-stats", cores=8, shuffle_partitions=8)
    s = Searcher(spark, idx)
    rows = []
    for name, q in QUERIES.items():
        node = parse_user_query(q)
        terms: set = set()
        patterns: set = set()
        s._walk(node, terms, patterns)
        ctx = {"dict": s._dict_lookup(sorted(terms), sorted(patterns)),
               "allowed": None}
        units = s._scoring_units(node, ctx)
        if not units:
            continue
        all_terms = sorted({t for _, tm in units for t in tm})
        # metadata-only sweep: total candidate volume the PLAIN path
        # decodes (every (term, block) row of the query's terms)
        meta = (s._scan_blocks(all_terms)
                .agg(F.count("*").alias("rows"),
                     F.sum("n").alias("postings"),
                     F.countDistinct("block").alias("blocks"))
                .collect()[0])

        t0 = time.time()
        plain = s.query_df(q, k=k, prune="never").collect()
        t_plain = time.time() - t0

        t0 = time.time()
        pruned_df = s.query_df(q, k=k, prune="always")
        pruned = pruned_df.collect()
        t_pruned = time.time() - t0

        ident = [(r["doc_id"], round(r["score"], 9)) for r in plain] == \
                [(r["doc_id"], round(r["score"], 9)) for r in pruned]
        out = {
            "query": name,
            "n_terms": len(all_terms),
            "total_block_rows": int(meta["rows"]),
            "total_blocks": int(meta["blocks"]),
            "total_postings": int(meta["postings"]),
            # set by _eval_pruned during the prune='always' run:
            # n_blocks (per-block sweep size), seed, kept (blocks the
            # final plan decodes), docs_ub (candidate doc volume)
            "prune": getattr(s, "_last_prune_stats", None),
            "wall_plain_sec": round(t_plain, 3),
            "wall_pruned_sec": round(t_pruned, 3),
            "results_identical": ident,
        }
        rows.append(out)
        print(json.dumps(out))
    print(json.dumps({"index": idx, "k": k, "queries": len(rows)}))


if __name__ == "__main__":
    main()
