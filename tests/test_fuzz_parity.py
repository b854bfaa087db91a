"""Differential fuzzing: random corpus + random queries, distributed
engine vs pure-Python oracle.  Catches corner cases the fixed fixtures
miss (position interactions, unicode, empty fields, operator nests)."""

import random

import pytest

from conftest import assert_results_match
from mdq_spark.build import DOCS_SCHEMA, build_index
from mdq_spark.oracle import OracleIndex
from mdq_spark.queryparse import parse_user_query
from mdq_spark.plan import describe_query
from mdq_spark.search import Searcher

pytestmark = pytest.mark.spark

WORDS = ["alpha", "beta", "gamma", "delta", "run", "running", "runs",
         "c++", "c#", "at&t", "don't", "3,14", "x86", "merge", "sorts",
         "naïve", "café", "hee", "zig", "_private", "P.T.O."]
TAGS = ["rust", "python", "go", ""]
AUTHORS = ["ada", "bob", "cyd"]

rng = random.Random(20260816)


def rand_doc(i):
    body = " ".join(rng.choice(WORDS)
                    for _ in range(rng.randrange(3, 25)))
    title = " ".join(rng.choice(WORDS) for _ in range(rng.randrange(0, 4)))
    tags = [t for t in rng.sample(TAGS, rng.randrange(0, 3)) if t]
    import hashlib
    return dict(doc_id=i, fullpath=f"f/{i}.md", title=title, subtitle="",
                authors=rng.sample(AUTHORS, rng.randrange(0, 2)),
                date=1600000000 + i, tags=tags, weight=0, writes=0,
                views=0, body=body,
                sha256=hashlib.sha256(body.encode()).hexdigest())


DOCS = [rand_doc(i) for i in range(1, 41)]


def rand_query():
    def piece():
        r = rng.random()
        w = rng.choice(WORDS)
        if r < 0.45:
            return w
        if r < 0.6:
            return f'"{rng.choice(WORDS)} {rng.choice(WORDS)}"'
        if r < 0.75:
            field = rng.choice(["title", "tag", "author"])
            return f"{field}:{w.replace(':', '')}"
        if r < 0.85:
            return w[:3]  # partial prefix
        return f"{w} {rng.choice(WORDS)}"

    r = rng.random()
    if r < 0.4:
        return " ".join(piece() for _ in range(rng.randrange(1, 4)))
    op = rng.choice(["AND", "OR", "AND NOT", "XOR", "AND MAYBE",
                     "FILTER", "NEAR", "SYNONYM"])
    return f"{piece()} {op} {piece()}"


QUERIES = [rand_query() for _ in range(35)]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzzidx"))
    df = spark.createDataFrame(DOCS, schema=DOCS_SCHEMA)
    build_index(spark, df, out, block_span=8, n_buckets=8)
    return Searcher(spark, out), OracleIndex.build(DOCS)


@pytest.mark.parametrize("q", QUERIES)
def test_fuzz_query_parity(setup, q):
    searcher, oracle = setup
    expected = oracle.search(q)
    actual = searcher.search(q)
    assert_results_match(expected, actual)


def test_parser_never_crashes():
    fuzz = random.Random(7)
    chars = list("abcXYZ019 .,;:+#&'\"()*-_<>RANGESCALEDORANDNOT\\/\n\t")
    for _ in range(3000):
        s = "".join(fuzz.choice(chars)
                    for _ in range(fuzz.randrange(0, 50)))
        node = parse_user_query(s)   # must not raise
        describe_query(node)         # must not raise
