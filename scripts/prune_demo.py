#!/usr/bin/env python
"""Block-max pruning demonstration on a score-skewed corpus.

The replicated `amplify` corpus is the WORST case for WAND by
construction — every doc-range block holds ~13 identical copies of the
base corpus, so all block upper bounds coincide and nothing can be
pruned (scripts/prune_stats.py shows kept == n_blocks there).  This
script builds a GRADED amplification instead: a marker term whose wdf
decays with the replica index, i.e. with the doc-id range — the shape
a time-ordered or quality-ordered real corpus has.  Top-k docs then
live in the first blocks and the bound sweep prunes the tail.

Usage: python scripts/prune_demo.py [amp] [sf_dir]

Prints one JSON line: blocks total vs decoded, wall with/without
pruning, identity check.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def graded_corpus(sf_dir: str, amp: int) -> str:
    out = os.path.join(REPO, "_idx_cache",
                       f"graded{amp}_" + os.path.basename(sf_dir.rstrip("/")))
    marker = os.path.join(out, "_SUCCESS_AMP")
    if os.path.exists(marker):
        return out
    import duckdb
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'").fetchone()[0]
    # marker-term wdf decays 40 -> 1 across replicas (doc-id ranges)
    con.execute(f"""
        COPY (
          SELECT d.doc_id + r.r * {n} AS doc_id,
                 d.text || repeat(' gradient',
                                  1 + ((({amp} - 1 - r.r) * 40) // {amp}))
                   AS text,
                 d.lang,
                 d.source || '_r' || r.r AS source,
                 d.n_chars
          FROM '{sf_dir}/documents.parquet' d,
               (SELECT unnest(range({amp})) AS r) r
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    open(marker, "w").write("ok")
    return out


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    corpus = graded_corpus(sf_dir, amp)

    from mdq_spark.session import get_spark
    from mdq_spark.build import build_index
    from mdq_spark.ingest import docs_from_documents_table
    from mdq_spark.search import Searcher

    spark = get_spark("prune-demo", cores=8, shuffle_partitions=8)
    idx = os.path.join(REPO, "_idx_cache", f"prune_demo_{amp}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        docs = docs_from_documents_table(spark, corpus)
        build_index(spark, docs, idx)
    s = Searcher(spark, idx)

    q = "gradient "
    t0 = time.time()
    plain = s.query_df(q, k=10, prune="never").collect()
    t_plain = time.time() - t0
    t0 = time.time()
    pruned = s.query_df(q, k=10, prune="always").collect()
    t_pruned = time.time() - t0
    ident = [(r["doc_id"], round(r["score"], 9)) for r in plain] == \
            [(r["doc_id"], round(r["score"], 9)) for r in pruned]
    st = dict(getattr(s, "_last_prune_stats", {}))
    print(json.dumps({
        "amp": amp, "n_docs": int(s.N),
        "prune": st,
        "blocks_decoded": (st.get("kept", 0) or 0) + st.get("seed", 0),
        "wall_plain_sec": round(t_plain, 3),
        "wall_pruned_sec": round(t_pruned, 3),
        "results_identical": ident,
    }))


if __name__ == "__main__":
    main()
