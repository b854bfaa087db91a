"""Xapian-compatible text tokenization (pure Python, Arrow-batch friendly).

From-scratch reimplementation of the term-splitting algorithm the
reference engine uses — ``parse_terms`` in
``xapian-core-1.4.17/queryparser/termgenerator_internal.cc:140-247``
(the tarball bundled in ``/root/reference/``) — plus the STEM_SOME
dual-emission indexing strategy of ``TermGenerator::Internal::index_text``
(same file, lines 249-315) that the reference invokes via
``index_text_with_prefix`` / ``index_text`` (``/root/reference/src/document.rs:162-190``).

Semantics reproduced exactly:

* word characters = Unicode categories L*, M*, N*, Pc; lowercased
* leading acronym folding: ``P.T.O.`` -> ``pto`` (>= 2 capitals)
* infix joins inside words: ``'  &  U+00B7  U+05F4  U+2027`` (and the
  Unicode apostrophes U+2019/U+201B normalized to ``'``); zero-width
  characters dropped
* digit separators ``, . ;`` (and friends) joined inside numbers: ``3,14``
* trailing ``+`` / ``#`` kept, up to three: ``c++``, ``c#`` — but not when
  followed by another word char (``fish+chips`` -> ``fish``, ``chips``)
* terms longer than 64 **bytes** (UTF-8) are dropped
  (``termgenerator_internal.h:44-49``)
* STEM_SOME: each kept term is emitted twice — the exact form carrying a
  position, and a ``Z``-prefixed Snowball-stemmed form without position;
  terms whose first char is not a lowercase-able letter are not stemmed
  (``should_stem``, ``termgenerator_internal.cc:63-73``).

CJK handling has two faithful modes:

* default (``cjk_ngram=False``): CJK codepoints are plain word chars
  (category Lo) and an unbroken CJK run is ONE term — the behavior the
  reference actually exhibits, since it never sets FLAG_CJK_NGRAM nor
  the XAPIAN_CJK_NGRAM env var (xapian_utils.rs:584-591).
* flagged (``cjk_ngram=True``): Xapian's FLAG_CJK_NGRAM branch
  (termgenerator_internal.cc:177-196 + cjk-tokenizer.cc): a CJK run is
  split by ``CJKTokenIterator`` into interleaved unigrams and bigrams
  (c1, c1c2, c2, c2c3, ..., cN); unigrams carry positions, bigrams are
  wdf-only (``action(term, with_positions && tk.unigram())``); a
  non-CJK term also ends at a CJK codepoint boundary
  (``goto endofterm``); CJK grams are NOT lowercased on the index side
  (CJKTokenIterator appends raw codepoints — matters only for the
  fullwidth-Latin block FF00-FFEF, faithfully reproduced); STEM_SOME
  Z-twins are emitted for grams exactly like other terms (category Lo
  passes should_stem; the Snowball English stemmer is an identity on
  CJK).  Quirks reproduced: a term pending when a CJK span starts
  (reachable via an accepted infix, e.g. ``a'中b``) survives the span
  un-emitted and keeps accumulating after it — and is silently dropped
  when input ends inside/right after the span (the C++ ``return``
  inside the branch's skip loop).
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, Iterator, NamedTuple, Optional

from .stem import stem

MAX_WORD_LENGTH = 64  # bytes of UTF-8 (termgenerator_internal.h:44-49)

# Xapian is_wordchar: Lu Ll Lt Lm Lo Mn Me Mc Nd Nl No Pc
_WORDCHAR_CATS = frozenset(
    ["Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Me", "Mc", "Nd", "Nl", "No", "Pc"]
)
# should_stem: first char category of the (lowercased) term
_STEM_CATS = frozenset(["Ll", "Lt", "Lm", "Lo"])

_INFIX_KEEP = frozenset(["'", "&", "\u00b7", "\u05f4", "\u2027"])
_INFIX_APOS = frozenset(["\u2019", "\u201b"])
_DIGIT_SEPS = frozenset(
    [",", ".", ";", "\u037e", "\u0589", "\u060d", "\u07f8",
     "\u2044", "\ufe10", "\ufe13", "\ufe14"]
)


def _is_zero_width(ch: str) -> bool:
    o = ord(ch)
    return 0x200B <= o <= 0x200D or o == 0x2060 or o == 0xFEFF


_ASCII_WORDCHARS = frozenset(
    ch for ch in map(chr, range(128))
    if unicodedata.category(ch) in _WORDCHAR_CATS)


def _is_wordchar(ch: str) -> bool:
    # ASCII fast table: one frozenset probe instead of a unicodedata
    # category call (the char loop runs once per character)
    if ch < "\x80":
        return ch in _ASCII_WORDCHARS
    return unicodedata.category(ch) in _WORDCHAR_CATS


def _lower(ch: str) -> str:
    """Simple (single-codepoint) case folding, like Unicode::tolower."""
    low = ch.lower()
    return low if len(low) == 1 else ch


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


def _is_upper_ascii(ch: str) -> bool:
    return "A" <= ch <= "Z"


class Token(NamedTuple):
    term: str
    positional: bool
    cjk: bool = False


def _is_cjk_codepoint(ch: str) -> bool:
    """``CJK::codepoint_is_cjk`` (cjk-tokenizer.cc:69-84), including its
    quirks (e.g. the Kangxi-radical block 2F00-2FDF is NOT listed)."""
    o = ord(ch)
    if o < 0x2E80:
        return False
    return (o <= 0x2EFF
            or 0x3000 <= o <= 0x9FFF
            or 0xA700 <= o <= 0xA71F
            or 0xAC00 <= o <= 0xD7AF
            or 0xF900 <= o <= 0xFAFF
            or 0xFE30 <= o <= 0xFE4F
            or 0xFF00 <= o <= 0xFFEF
            or 0x20000 <= o <= 0x2A6DF
            or 0x2F800 <= o <= 0x2FA1F)


def cjk_grams(run: str) -> list[Token]:
    """``CJKTokenIterator`` emission order over one CJK run: unigrams and
    bigrams interleaved — c1, c1c2, c2, c2c3, ..., cN (cjk-tokenizer.cc:
    96-129).  Unigrams are positional (``with_positions && tk.unigram()``,
    termgenerator_internal.cc:183); bigrams are wdf-only."""
    out = []
    n = len(run)
    for k in range(n):
        out.append(Token(run[k], True, True))
        if k + 1 < n:
            out.append(Token(run[k] + run[k + 1], False, True))
    return out


def parse_terms(text: str, cjk_ngram: bool = False,
                cjk_runs: bool = False) -> Iterator[Token]:
    """Yield word tokens (already lowercased) in document order.

    Mirrors ``parse_terms`` (termgenerator_internal.cc:140-247).
    ``positional`` mirrors the ``with_positions`` flag — always True
    except for CJK bigrams in ``cjk_ngram`` mode; the STEM_SOME layer
    decides which emitted *terms* carry positions.

    ``cjk_ngram=True`` enables the FLAG_CJK_NGRAM branch (grams per
    ``cjk_grams``).  ``cjk_runs=True`` (query side) yields each CJK run
    as ONE lowercased Token(run, True, cjk=True) instead — mirroring
    ``QueryParser::Internal::parse_term`` (queryparser_internal.cc:
    748-753), where the whole run becomes a single CJKTERM (and is
    tolower'd with the rest of the term at :3386, unlike the raw-case
    index side).
    """
    if cjk_runs:
        cjk_ngram = True
    n = len(text)
    i = 0
    while True:
        # advance to start of next term
        while True:
            if i >= n:
                return
            ch = text[i]
            if _is_wordchar(ch):
                break
            i += 1

        term_chars: list[str] = []

        # acronym: initials separated by '.' (P.T.O.); >=2 caps, and not
        # immediately followed by a word char
        if _is_upper_ascii(text[i]):
            p = i
            while True:
                term_chars.append(_lower(text[p]))
                p += 1
                # C++: `p != end && *p == '.' && ++p != end && U_isupper(*p)`
                # — the dot is consumed as soon as it is seen, even when the
                # char after it fails the uppercase test.
                if p < n and text[p] == ".":
                    p += 1
                    if p < n and _is_upper_ascii(text[p]):
                        continue
                break
            if len(term_chars) > 1:
                if p >= n or not _is_wordchar(text[p]):
                    i = p
                    yield Token("".join(term_chars), True)
                    continue
            term_chars = []

        # main word loop (C++ while(true), termgenerator_internal.cc:
        # 176-225) with the CJK branch at the loop top and infix handling
        ch = _lower(text[i])
        while True:
            if cjk_ngram and _is_cjk_codepoint(text[i]) \
                    and _is_wordchar(text[i]):
                # CJK span.  NOTE: term_chars may be non-empty here (an
                # accepted infix re-enters the loop top, e.g. "a'中b") —
                # like the C++ `term` string it persists across the span
                # un-emitted and keeps accumulating afterwards.
                j = i
                while j < n and _is_cjk_codepoint(text[j]) \
                        and _is_wordchar(text[j]):
                    j += 1
                run = text[i:j]
                i = j
                if cjk_runs:
                    yield Token("".join(_lower(c) for c in run), True, True)
                else:
                    yield from cjk_grams(run)
                # skip to the next word char; end-of-input returns,
                # dropping any pending term_chars (the C++ `return`
                # inside the span's skip loop)
                while True:
                    if i >= n:
                        return
                    if _is_wordchar(text[i]):
                        break
                    i += 1
                ch = _lower(text[i])
                continue
            # inner do-while: accumulate word chars
            goto_endofterm = False
            while True:
                prevch = ch
                term_chars.append(ch)
                i += 1
                if i >= n:
                    goto_endofterm = True
                    break
                if cjk_ngram and _is_cjk_codepoint(text[i]):
                    # C++ `goto endofterm` — skips suffix handling too,
                    # but the suffix code is a no-op here anyway (a CJK
                    # codepoint is a wordchar only when it would have
                    # stripped the suffix, and never in "+#")
                    goto_endofterm = True
                    break
                nxt = text[i]
                if _is_wordchar(nxt):
                    ch = _lower(nxt)
                    continue
                break
            if goto_endofterm:
                break
            # possible infix: one non-word char with a word char after it
            if i + 1 >= n:
                break
            after = text[i + 1]
            if not _is_wordchar(after):
                break
            infix = text[i]
            if _is_digit(prevch) and _is_digit(after):
                if infix in _DIGIT_SEPS:
                    pass  # keep
                elif _is_zero_width(infix):
                    infix = ""
                else:
                    break
            else:
                if infix in _INFIX_KEEP:
                    pass
                elif infix in _INFIX_APOS:
                    infix = "'"
                elif _is_zero_width(infix):
                    infix = ""
                else:
                    break
            if infix:
                term_chars.append(infix)
            i += 1
            ch = _lower(text[i])
            # loop back to the while(true) top — re-checks the CJK branch
            # (C++ does the same: `ch = nextch; itor = next;` then falls
            # through to the loop top)

        if not term_chars:
            continue

        # trailing '+'/'#' suffix, up to 3, not followed by a word char
        base_len = len(term_chars)
        count = 0
        while i < n and text[i] in "+#":
            count += 1
            if count > 3:
                del term_chars[base_len:]
                break
            term_chars.append(text[i])
            i += 1
        else:
            if i < n and _is_wordchar(text[i]):
                del term_chars[base_len:]

        yield Token("".join(term_chars), True)


def _should_stem(term: str) -> bool:
    return bool(term) and unicodedata.category(term[0]) in _STEM_CATS


# --- fast path ---------------------------------------------------------------
# Tokens never span whitespace (whitespace is neither wordchar nor infix),
# so text can be processed per whitespace-chunk.  A chunk containing none
# of the characters that activate special tokenizer rules — + # & '
# (suffix/infix), any non-ASCII codepoint, a digit-separator pattern, or
# an uppercase-followed-by-dot (the ONLY way uppercase matters: the
# acronym rule needs an ``X.`` sequence; a plain capitalized word just
# lowercases) — tokenizes exactly as runs of [a-z0-9_] over the
# lowercased chunk.  Such chunks go through one compiled regex;
# everything else falls back to the exact char-loop.  Equivalence is
# property-tested against parse_terms (tests/test_tokenize.py).

import re as _re

# ``+``/``#`` only matter via the trailing-suffix rule, and a suffix is
# KEPT only when not followed by a word char — so a +/# that IS
# followed by one is provably dropped and acts as a plain separator,
# exactly what the findall fast path does.  The negative lookahead
# therefore only triggers on +/# that could survive as a suffix
# (end-of-chunk or followed by another non-word char, e.g. "c++").
# This matters for RFC3339 dates ("...40+00:00"), which would
# otherwise send every date field through the exact char loop.
_TRIGGER = _re.compile(r"[^\x00-\x7f]|[A-Z&']|\d[.,;]\d|[+#](?![a-z0-9_])")
_TRIGGER_UPPER_OK = _re.compile(
    r"[^\x00-\x7f]|[&']|\d[.,;]\d|[A-Z]\.|[+#](?![A-Za-z0-9_])")
_FAST = _re.compile(r"[a-z0-9_]+")
_LOWER_ASCII = frozenset("abcdefghijklmnopqrstuvwxyz")


def token_list(text: str) -> list[str]:
    """Token list identical to ``parse_terms`` output but with fast
    regex paths for trigger-free input.  Three tiers, checked on the
    WHOLE text first (one C-level search/findall instead of one per
    whitespace chunk — the common case for clean prose), then per
    chunk:

    * fully benign (no trigger anywhere): tokens are exactly runs of
      ``[a-z0-9_]`` — whitespace and all other non-word chars only
      separate, and no special rule can fire;
    * upper-ok (uppercase but never ``X.``): same runs over
      ``.lower()`` — the acronym rule needs an ``X.`` sequence, a
      plain capitalized word just lowercases;
    * otherwise the per-chunk split with the same two tiers per chunk
      and the exact char loop for chunks that trigger.

    The tiers only widen the scope of the same trigger tests (tokens
    never span whitespace), so equivalence with ``parse_terms`` is
    property-tested once for all tiers (tests/test_tokenize.py)."""
    if _TRIGGER.search(text) is None:
        return _FAST.findall(text)
    if _TRIGGER_UPPER_OK.search(text) is None:
        return _FAST.findall(text.lower())
    out: list[str] = []
    ext = out.extend
    for chunk in text.split():
        if _TRIGGER.search(chunk) is None:
            ext(_FAST.findall(chunk))
        elif _TRIGGER_UPPER_OK.search(chunk) is None:
            ext(_FAST.findall(chunk.lower()))
        else:
            ext(tok.term for tok in parse_terms(chunk))
    return out


def chunk_tokens(text: str) -> Iterator[str]:
    """Token stream identical to ``parse_terms`` (see token_list)."""
    return iter(token_list(text))


def index_text(
    text: str,
    prefix: str = "",
    start_pos: int = 0,
    wdf_inc: int = 1,
    cjk_ngram: bool = False,
) -> tuple[list[tuple[str, Optional[int], int]], int]:
    """STEM_SOME emission for one text run.

    Returns ``(rows, cur_pos)`` where each row is
    ``(term, position-or-None, wdf_inc)``:

    * ``prefix + token`` with a 1-based position — except CJK bigrams in
      ``cjk_ngram`` mode, which are wdf-only (``add_term``, no position,
      no ``++cur_pos``; termgenerator_internal.cc:272-276),
    * ``"Z" + prefix + stem(token)`` without a position (stemmed terms are
      skipped for tokens not starting with a letter).

    Terms whose UTF-8 length exceeds 64 bytes are dropped entirely.
    Mirrors termgenerator_internal.cc:249-315; position counter continues
    across calls via ``start_pos`` exactly like ``TermGenerator`` state.
    """
    rows: list[tuple[str, Optional[int], int]] = []
    cur_pos = start_pos
    zprefix = "Z" + prefix
    lower_ascii = _LOWER_ASCII
    if cjk_ngram:
        stream: Iterable[Token] = parse_terms(text, cjk_ngram=True)
    else:
        # default mode: every token is positional — iterate raw strings
        stream = (Token(t, True) for t in token_list(text))
    for term, positional, _cjk in stream:
        # byte-length cap; <=16 chars can never exceed 64 UTF-8 bytes
        if len(term) > 16 and \
                len(term.encode("utf-8")) > MAX_WORD_LENGTH:
            continue
        if positional:
            cur_pos += 1
            rows.append((prefix + term, cur_pos, wdf_inc))
        else:
            rows.append((prefix + term, None, wdf_inc))
        c0 = term[0]
        if c0 in lower_ascii:
            pass  # Ll: stem
        elif not _should_stem(term):
            continue
        st = stem(term)
        if not st:
            continue
        rows.append((zprefix + st, None, wdf_inc))
    return rows, cur_pos


# Field -> Xapian prefix convention (reference src/document.rs:171-180 and
# src/interactive/xapian_utils.rs:369-379).
FIELD_PREFIXES = {
    "authors": "A",
    "date": "D",
    "fullpath": "U",
    "title": "S",
    "subtitle": "XS",
    "tags": "K",
}


def document_terms(doc: dict,
                   cjk_ngram: bool = False,
                   ) -> list[tuple[str, Optional[int], int]]:
    """Full STEM_SOME term stream for one document dict.

    Field order and rendering mirror ``Document::update_index``
    (reference ``src/document.rs:162-190``):
    authors (comma-joined) -> date (RFC3339 UTC) -> fullpath -> title ->
    subtitle -> one call per tag -> unprefixed body.  The position counter
    is shared across all calls (one TermGenerator per document; Xapian
    inserts no gap between ``index_text`` calls by default).
    """
    from .dates import render_rfc3339

    def _aslist(v) -> list:
        # tolerate numpy arrays from Arrow batches
        if v is None:
            return []
        if isinstance(v, (list, tuple)):
            return [str(x) for x in v]
        if isinstance(v, str):
            return [v]
        try:
            return [str(x) for x in v]
        except TypeError:
            return [str(v)]

    def _asstr(v) -> str:
        return "" if v is None else str(v)

    rows: list[tuple[str, Optional[int], int]] = []
    pos = 0
    authors = _aslist(doc.get("authors"))
    out, pos = index_text(",".join(authors), "A", pos, cjk_ngram=cjk_ngram)
    rows.extend(out)
    date = doc.get("date", 0)
    out, pos = index_text(render_rfc3339(0 if date is None else date),
                          "D", pos, cjk_ngram=cjk_ngram)
    rows.extend(out)
    out, pos = index_text(_asstr(doc.get("fullpath")), "U", pos,
                          cjk_ngram=cjk_ngram)
    rows.extend(out)
    out, pos = index_text(_asstr(doc.get("title")), "S", pos,
                          cjk_ngram=cjk_ngram)
    rows.extend(out)
    out, pos = index_text(_asstr(doc.get("subtitle")), "XS", pos,
                          cjk_ngram=cjk_ngram)
    rows.extend(out)
    for tag in _aslist(doc.get("tags")):
        out, pos = index_text(tag, "K", pos, cjk_ngram=cjk_ngram)
        rows.extend(out)
    out, pos = index_text(_asstr(doc.get("body")), "", pos,
                          cjk_ngram=cjk_ngram)
    rows.extend(out)
    return rows


def document_term_rows(doc: dict,
                       cjk_ngram: bool = False) -> tuple[dict, int]:
    """Aggregated per-(doc, term) stream for the index-build kernel:
    returns ``({term: [wdf, gap-varint bytearray | None, last_pos]},
    doclen)`` in one pass — same emission semantics as document_terms
    (field order, STEM_SOME, shared position counter) without
    materializing the row list.

    Positions are encoded AS THEY ARRIVE: each occurrence appends the
    LEB128 varint of ``pos - last - 1`` straight into the term's
    bytearray (positions are strictly increasing within a doc, so gaps
    are never negative).  The staging row's positions blob is then just
    ``varint(wdf) + bytes`` — no per-position Python list and no
    per-(doc, term) encode call survive on the build hot path
    (VERDICT r01 #5; layout identical to codec.encode_position_list)."""
    from .dates import render_rfc3339

    def _aslist(v) -> list:
        if v is None:
            return []
        if isinstance(v, (list, tuple)):
            return [str(x) for x in v]
        if isinstance(v, str):
            return [v]
        try:
            return [str(x) for x in v]
        except TypeError:
            return [str(v)]

    def _asstr(v) -> str:
        return "" if v is None else str(v)

    agg: dict = {}
    pos = 0
    doclen = 0
    lower_ascii = _LOWER_ASCII
    agg_get = agg.get
    _stem = stem

    def run(text: str, prefix: str) -> None:
        nonlocal pos, doclen
        zprefix = "Z" + prefix
        if not cjk_ngram:
            # default mode: every token is positional (parse_terms only
            # emits positional=False for CJK bigrams under the flag), so
            # iterate the raw token strings — no Token tuples, no
            # generator bounce on the build hot path.
            for term in token_list(text):
                if len(term) > 16 and \
                        len(term.encode("utf-8")) > MAX_WORD_LENGTH:
                    continue
                doclen += 1
                key = prefix + term
                pos += 1
                ent = agg_get(key)
                if ent is None:
                    ent = agg[key] = [1, bytearray(), -1]
                else:
                    ent[0] += 1
                v = pos - ent[2] - 1
                ent[2] = pos
                buf = ent[1]
                while v >= 128:
                    buf.append((v & 0x7F) | 0x80)
                    v >>= 7
                buf.append(v)
                c0 = term[0]
                if c0 not in lower_ascii and not _should_stem(term):
                    continue
                st = _stem(term)
                if not st:
                    continue
                zkey = zprefix + st
                doclen += 1
                zent = agg_get(zkey)
                if zent is None:
                    agg[zkey] = [1, None, 0]
                else:
                    zent[0] += 1
            return
        for term, positional, _cjk in parse_terms(text, cjk_ngram=True):
            if len(term) > 16 and \
                    len(term.encode("utf-8")) > MAX_WORD_LENGTH:
                continue
            doclen += 1
            key = prefix + term
            if positional:
                pos += 1
                ent = agg_get(key)
                if ent is None:
                    ent = agg[key] = [1, bytearray(), -1]
                else:
                    ent[0] += 1
                v = pos - ent[2] - 1
                ent[2] = pos
                buf = ent[1]
                while v >= 128:
                    buf.append((v & 0x7F) | 0x80)
                    v >>= 7
                buf.append(v)
            else:
                # CJK bigram: add_term — wdf only, no position row (a
                # bigram key never also occurs positionally, so the
                # count==wdf blob invariant is unaffected)
                ent = agg_get(key)
                if ent is None:
                    agg[key] = [1, None, 0]
                else:
                    ent[0] += 1
            c0 = term[0]
            if c0 not in lower_ascii and not _should_stem(term):
                continue
            st = _stem(term)
            if not st:
                continue
            zkey = zprefix + st
            doclen += 1
            zent = agg_get(zkey)
            if zent is None:
                agg[zkey] = [1, None, 0]
            else:
                zent[0] += 1

    date = doc.get("date", 0)
    run(",".join(_aslist(doc.get("authors"))), "A")
    run(render_rfc3339(0 if date is None else date), "D")
    run(_asstr(doc.get("fullpath")), "U")
    run(_asstr(doc.get("title")), "S")
    run(_asstr(doc.get("subtitle")), "XS")
    for tag in _aslist(doc.get("tags")):
        run(tag, "K")
    run(_asstr(doc.get("body")), "")
    return agg, doclen


def query_terms(text: str) -> list[str]:
    """Tokenize a query-side text run (no stemming, no prefixes)."""
    return [t.term for t in parse_terms(text)
            if len(t.term.encode("utf-8")) <= MAX_WORD_LENGTH]
