"""Oracle engine tests: BM25 math verified by hand, operator semantics,
tie-breaks, metadata predicates, and the corpus adapters."""

import math

import pytest

from mdq_spark import bm25
from mdq_spark.corpus import (
    FrontmatterError,
    doc_from_documents_row,
    doc_from_markdown,
)
from mdq_spark.oracle import OracleIndex


def make_doc(doc_id, body, title="", tags=(), authors=(), date=0):
    return {
        "doc_id": doc_id,
        "fullpath": f"d{doc_id}.md",
        "title": title,
        "subtitle": "",
        "authors": list(authors),
        "date": date,
        "tags": list(tags),
        "weight": 0,
        "writes": 0,
        "views": 0,
        "body": body,
    }


@pytest.fixture(scope="module")
def idx():
    docs = [
        make_doc(1, "spark query engine", title="intro", tags=["a"]),
        make_doc(2, "spark spark spark index", tags=["b"]),
        make_doc(3, "query planner costs", tags=["a", "b"]),
        make_doc(4, "the quick brown fox jumps over the lazy dog"),
        make_doc(5, "quick brown foxes jumping quickly", tags=["a"]),
        make_doc(6, "hee hee hee spark"),
        make_doc(7, "hee spark hee", title="hee"),
        make_doc(8, "completely unrelated words here"),
    ]
    return OracleIndex.build(docs)


def test_stats(idx):
    assert idx.N == 8
    # doc 4: 9 tokens; 'the' repeats -> unstemmed wdf rows: 9 positions;
    # stems: every token stemmed (all letters) -> doclen == 9 + 9 = 18
    # plus NO title/tags -> date terms: date=0 renders 1970-01-01T00:00:00+00:00
    # which tokenizes to [1970, 01, 01t00, 00, 00, 00, 00] = 7 D-terms,
    # digit-initial so unstemmed; fullpath "d4.md" -> Ud4 Umd (letters? 'd4'
    # starts with letter -> stemmed too)
    # Just sanity-check monotonicity rather than absolute numbers here:
    assert idx.doclen[4] > idx.doclen[8] > 0


def test_term_scoring_by_hand():
    # tiny controlled corpus to hand-check the BM25 parity math
    from mdq_spark.plan import Term
    docs = [make_doc(1, "apple banana"), make_doc(2, "apple apple"),
            make_doc(3, "cherry")]
    ix = OracleIndex.build(docs)
    res = ix.evaluate(Term("Zappl", 1))
    # term = Zappl; df=2, N=3
    pl = ix.postings["Zappl"]
    assert pl == {1: 1, 2: 2}
    N, df = 3, 2
    tw = (N - df + 0.5) / (df + 0.5)  # 0.6 < 2 -> floored
    tw = tw * 0.5 + 1
    w = math.log(tw) * (2 * 1) / (1 + 1) * 2  # k3 part * (k1+1)
    avg = sum(ix.doclen.values()) / 3
    for d, wdf in pl.items():
        normlen = max(ix.doclen[d] / avg, 0.5)
        expect = w * wdf / (1 * (normlen * 0.5 + 0.5) + wdf)
        assert res[d] == pytest.approx(expect, abs=1e-12)
    assert 3 not in res


def test_tw_floor_applies():
    # df > N/2 triggers the tw<2 floor; ensure weight stays positive
    docs = [make_doc(i, "common word") for i in range(1, 5)]
    ix = OracleIndex.build(docs)
    res = ix.search("common ")
    assert len(res) == 4 and all(w > 0 for _, w in res)


def test_tie_break_ascending_docid(idx):
    # docs 6 and 7 both contain 'hee'; identical doclen would tie —
    # different doclens here, so craft an exact tie instead:
    docs = [make_doc(10, "zig zag"), make_doc(11, "zig zag"),
            make_doc(12, "other stuff")]
    ix = OracleIndex.build(docs)
    res = ix.search("zig ")
    assert [d for d, _ in res] == [10, 11]
    assert res[0][1] == res[1][1]


def test_phrase(idx):
    res = idx.search('"hee hee hee" ')
    assert [d for d, _ in res] == [6]  # only doc 6 has 3 consecutive hees
    res2 = idx.search('"quick brown" ')
    assert set(d for d, _ in res2) == {4, 5}


def test_stemming_matches(idx):
    # 'jumping'/'jumps' both stem to Zjump
    res = idx.search("jumping ")
    assert set(d for d, _ in res) == {4, 5}


def test_and_or_not(idx):
    assert set(d for d, _ in idx.search("spark AND query")) == {1}
    assert set(d for d, _ in idx.search("spark AND NOT query")) == {2, 6, 7}
    # final chunk gets FLAG_PARTIAL: wildcard "fox" also hits "foxes"
    d_or = set(d for d, _ in idx.search("planner OR fox"))
    assert d_or == {3, 4, 5}
    d_xor = set(d for d, _ in idx.search("spark XOR query"))
    assert d_xor == {2, 3, 6, 7}


def test_and_maybe_filter(idx):
    from mdq_spark.queryparse import parse_chunk
    # compare against the same left-side tree the outer split produces:
    # intermediate chunk "quick " (no partial)
    base = idx.evaluate(parse_chunk("quick "))
    am = dict(idx.search("quick AND MAYBE lazy"))
    assert set(am) == set(base)
    assert am[4] > base[4]  # lazy boost (doc 4 only)
    assert am[5] == pytest.approx(base[5])
    fl = dict(idx.search("quick FILTER lazy"))
    assert set(fl) == {4}
    assert fl[4] == pytest.approx(base[4])  # right side adds no weight


def test_near(idx):
    # 'spark' NEAR 'index': doc2 positions ...
    res = idx.search("spark NEAR index")
    assert 2 in {d for d, _ in res}


def test_partial_wildcard(idx):
    # 'qui' expands over quick/quickly/... via dictionary prefix
    res = idx.search("qui")
    assert {d for d, _ in res} >= {4, 5}


def test_field_scoped(idx):
    res = idx.search("title:hee ")
    assert [d for d, _ in res] == [7]
    res = idx.search("tag:a ")
    assert {d for d, _ in res} == {1, 3, 5}


def test_lovehate(idx):
    from mdq_spark.queryparse import parse_chunk
    # lovehate is only reachable via chunk parsing (a leading '+' makes
    # the nom expression parser fail -> empty query; faithful quirk)
    assert idx.search("+quick -jumps") == []
    # note: hate terms are stemmed too — "-jumps" (Zjump) would kill
    # both doc 4 ("jumps") and doc 5 ("jumping"); use "-lazy" instead
    res = idx.evaluate(parse_chunk("+quick -lazy "))
    assert set(res) == {5}


def test_pure_not(idx):
    from mdq_spark.queryparse import parse_chunk
    # PureNot engages inside operator chunks; at top level the tokens
    # split and "NOT" alone degrades to a term (documented divergence)
    res = idx.evaluate(parse_chunk("NOT spark "))
    assert set(res) == {3, 4, 5, 8}
    res2 = idx.search("NOT spark AND quick")
    assert {d for d, _ in res2} == {4, 5}


def test_scaled(idx):
    from mdq_spark.queryparse import parse_chunk
    base = idx.evaluate(parse_chunk("quick "))
    scaled = dict(idx.search("quick SCALED 2"))
    for d, w in base.items():
        assert scaled[d] == pytest.approx(2 * w)


def test_empty_query(idx):
    assert idx.search("") == []


def test_metadata_predicate_prefilter(idx):
    res = idx.search("quick ", predicate=lambda doc: "a" in doc["tags"])
    assert {d for d, _ in res} == {5}


def test_range_inert(idx):
    # value slots never populated -> RANGE matches nothing (Q14)
    assert idx.search("quick RANGE 5") == []


def test_k_window(idx):
    docs = [make_doc(i, "popcorn") for i in range(1, 150)]
    ix = OracleIndex.build(docs)
    res = ix.search("popcorn ")
    assert len(res) == 100  # get_mset(0, 100) parity
    assert [d for d, _ in res] == list(range(1, 101))


# --- corpus adapters --------------------------------------------------------

def test_documents_row_adapter():
    d = doc_from_documents_row(0, "hello world text", "en", "src3")
    assert d["doc_id"] == 1
    assert d["fullpath"] == "src3/0.md"
    assert d["tags"] == ["en"]
    assert d["body"] == "hello world text"
    assert len(d["sha256"]) == 64


def test_markdown_adapter():
    raw = (
        "---\n"
        "author: Steve Sosik\n"
        "date: 2021-01-15T08:23:24-05:00\n"
        "tags:\n- vim\n- grep\n"
        "title: How to grep open buffers in Vim\n"
        "---\n\nRun this command\n"
    )
    d = doc_from_markdown(7, "notes/vim.md", raw)
    assert d["authors"] == ["Steve Sosik"]
    assert d["tags"] == ["vim", "grep"]
    assert d["date"] == 1610717004
    assert d["body"].strip() == "Run this command"
    assert d["title"].startswith("How to grep")


def test_markdown_adapter_variants():
    # scalar tag, inline list, epoch int date
    raw = "---\ntag: solo\ndate: 12345\ntitle: T\nauthors: [a, b]\n---\nbody"
    d = doc_from_markdown(1, "x.md", raw)
    assert d["tags"] == ["solo"]
    assert d["authors"] == ["a", "b"]
    assert d["date"] == 12345


def test_markdown_no_frontmatter_rejected():
    with pytest.raises(FrontmatterError):
        doc_from_markdown(1, "x.md", "just a body, no frontmatter")
