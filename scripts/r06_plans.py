#!/usr/bin/env python
"""Capture .explain("formatted") for the round-6 optimization targets
into plans/r06/<name>_<tag>.txt (tag = before|after).

Covers the bench headline queries (on the sf1.0 bench index) and the
gate entries touched this round (on sf0.01 inputs).

Usage: python scripts/r06_plans.py <before|after> [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    from pyspark.sql import functions as F
    from mdq_spark.search import Searcher
    from mdq_spark.session import get_spark, ensure_worker_imports

    spark = get_spark("r06-plans", cores=8, shuffle_partitions=8)
    ensure_worker_imports(spark)
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    caps: dict = {}

    idx = os.path.join(REPO, "_idx_cache", "bench_sf1.0_c32")
    if os.path.exists(os.path.join(idx, "manifest.json")):
        s = Searcher(spark, idx)
        caps["q1_free_text"] = lambda: s.query_df("sort merge join", k=10)
        caps["q2_field_scoped"] = lambda: s.query_df("tag:en sort", k=10)
        caps["q3_phrase"] = lambda: s.query_df('"the fast" ', k=10)
        caps["q4_boolean"] = lambda: s.query_df("sort AND NOT merge", k=10)
        caps["q5_and_maybe"] = lambda: s.query_df(
            "hash AND MAYBE batch", k=10)
        caps["q6_partial"] = lambda: s.query_df("vec", k=10)
        caps["q7_filtered"] = lambda: s.query_df(
            "sort merge", k=10,
            filters=F.array_contains(F.col("tags"), "en"))
        caps["batch_replay"] = lambda: s.batch_search(
            {"a": "sort ", "b": "sort merge "}, k=10)

    sf = "/root/testdata/sf0.01"
    from mdq_spark.entry_queries import queries as gate_queries
    gq = gate_queries()
    for name in ("ft_elite_top10", "xq_elite", "ann_ivf_top10",
                 "dedup_ngram_jaccard", "embed_neardup_pairs",
                 "ann_lsh_top10"):
        if name in gq:
            caps[name] = (lambda fn=gq[name]: fn(spark, sf))

    for name, mk in caps.items():
        if only and name not in only:
            continue
        try:
            p = plan_of(mk())
        except Exception as e:  # noqa
            p = f"ERROR capturing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p + "\n")
        print(f"wrote {path} ({len(p)} chars)")


if __name__ == "__main__":
    main()
