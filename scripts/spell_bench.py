#!/usr/bin/env python
"""Spelling fragment-table build: per-row UDF (r4) vs Arrow batch (r5).

VERDICT r04 #3 done-criterion: record the fragment-table build cost
before/after replacing the per-row ``F.udf`` pair with one mapInPandas
kernel.  The lexicon is synthetic (``w<base36>`` words over a realistic
length mix) because the real corpora's vocabularies (~40k terms) are
too small to show the per-row Python overhead that matters at a
10^12-file vocabulary — the kernel cost is per TERM, so a 2M-term
synthetic lexicon is the honest scale-model.

The "before" implementation is an inline copy of the old two-UDF
pipeline, verbatim from git history (mdq_spark/spell.py@438c430).

Usage: python scripts/spell_bench.py [n_terms]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def old_fragment_rows(lex):
    """r4 implementation (mdq_spark/spell.py@438c430): one Python call
    per term for the fragment list + one per exploded fragment row."""
    from pyspark.sql import functions as F
    from mdq_spark.spell import frag_bucket, word_fragments
    frag_udf = F.udf(lambda t: word_fragments(t), "array<string>")
    bucket_udf = F.udf(frag_bucket, "int")
    return (lex.select("term", "freq",
                       F.explode(frag_udf("term")).alias("fragment"))
            .withColumn("fbucket", bucket_udf("fragment")))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from pyspark.sql import functions as F
    from mdq_spark.session import get_spark
    from mdq_spark.spell import _fragment_rows

    spark = get_spark("spell-bench", cores=8, shuffle_partitions=8)
    # synthetic lexicon: base-36 words, length 4-13 (id-dependent)
    lex = (spark.range(n)
           .select(F.concat(F.lit("w"), F.conv(F.col("id"), 10, 36))
                   .alias("term"),
                   (F.col("id") % 1000 + 1).alias("freq"))
           .localCheckpoint(eager=True))  # exclude input gen from timing

    def run(fn, tag):
        t0 = time.time()
        cnt = fn(lex).count()
        return {"impl": tag, "rows": cnt,
                "wall_sec": round(time.time() - t0, 2)}

    # warm Python workers/Arrow once
    lex.limit(1000).mapInPandas(lambda it: it, "term string, freq long") \
        .count()
    new = run(_fragment_rows, "r5_mapInPandas")
    old = run(old_fragment_rows, "r4_per_row_udf")
    new2 = run(_fragment_rows, "r5_mapInPandas_rep2")
    out = {"n_terms": n, "runs": [new, old, new2],
           "speedup": round(old["wall_sec"] / min(new["wall_sec"],
                                                  new2["wall_sec"]), 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
