"""Streaming ingestion test: files dropped into a directory stream into
the index as upsert generations; results match a batch rebuild."""

import time

import pytest

from conftest import assert_results_match
from mdq_spark.build import DOCS_SCHEMA, build_index
from mdq_spark.oracle import OracleIndex
from mdq_spark.search import Searcher
from mdq_spark.streaming import stream_upsert

pytestmark = pytest.mark.spark


def doc(doc_id, fullpath, body):
    import hashlib
    return dict(doc_id=doc_id, fullpath=fullpath, title="t", subtitle="",
                authors=[], date=0, tags=[], weight=0, writes=0, views=0,
                body=body,
                sha256=hashlib.sha256(body.encode()).hexdigest())


def test_stream_upsert(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("stream_idx"))
    inbox = tmp_path_factory.mktemp("inbox")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    base = [doc(1, "a.md", "alpha beta"), doc(2, "b.md", "beta gamma")]
    build_index(spark, spark.createDataFrame(base, schema=DOCS_SCHEMA),
                idx, block_span=4, n_buckets=8)

    # drop two batches of new/changed docs into the inbox
    batch1 = [doc(0, "b.md", "beta beta zeta"), doc(0, "c.md", "omega")]
    spark.createDataFrame(batch1, schema=DOCS_SCHEMA) \
        .write.mode("append").parquet(str(inbox))

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(str(inbox))
    q = stream_upsert(spark, idx, stream, ckpt, available_now=True)
    q.awaitTermination(120)

    final = [base[0], doc(3, "b.md", "beta beta zeta"),
             doc(4, "c.md", "omega")]
    oracle = OracleIndex.build(final)
    s = Searcher(spark, idx)
    for query in ["beta ", "omega ", "alpha OR zeta"]:
        # ids may differ between oracle numbering and upsert numbering;
        # compare by fullpath + score
        exp = [(oracle.docs[d]["fullpath"], round(w, 9))
               for d, w in oracle.search(query)]
        got_rows = s.fetch(s.query_df(query, k=100),
                           columns=("doc_id", "fullpath")).collect()
        got = sorted(((r["fullpath"], round(r["score"], 9))
                      for r in got_rows), key=lambda x: (-x[1], x[0]))
        exp = sorted(exp, key=lambda x: (-x[1], x[0]))
        assert [e[0] for e in exp] == [g[0] for g in got], query
        for (ef, ew), (gf, gw) in zip(exp, got):
            assert abs(ew - gw) < 1e-9
