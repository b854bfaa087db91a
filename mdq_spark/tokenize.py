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

CJK n-gram mode is intentionally out of scope (corpus is source code;
SURVEY.md §7 descope list).
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


def parse_terms(text: str) -> Iterator[Token]:
    """Yield word tokens (already lowercased) in document order.

    Mirrors ``parse_terms`` (termgenerator_internal.cc:140-247) minus the
    CJK branch.  ``positional`` mirrors the ``with_positions`` flag and is
    always True here; the STEM_SOME layer decides which emitted *terms*
    carry positions.
    """
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

        # main word loop with infix handling
        ch = _lower(text[i])
        while True:
            prevch = ch
            term_chars.append(ch)
            i += 1
            if i >= n:
                break
            nxt = text[i]
            if _is_wordchar(nxt):
                ch = _lower(nxt)
                continue
            # possible infix: one non-word char with a word char after it
            if i + 1 >= n:
                break
            after = text[i + 1]
            if not _is_wordchar(after):
                break
            infix = nxt
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

_TRIGGER = _re.compile(r"[^\x00-\x7f]|[A-Z+#&']|\d[.,;]\d")
_TRIGGER_UPPER_OK = _re.compile(r"[^\x00-\x7f]|[+#&']|\d[.,;]\d|[A-Z]\.")
_FAST = _re.compile(r"[a-z0-9_]+")
_LOWER_ASCII = frozenset("abcdefghijklmnopqrstuvwxyz")


def chunk_tokens(text: str) -> Iterator[str]:
    """Token stream identical to ``parse_terms`` but with a fast regex
    path for trigger-free whitespace chunks.  Two tiers: fully benign
    chunks skip the lowercase copy; chunks whose only special feature
    is uppercase (the acronym rule needs an ``X.`` sequence — a plain
    capitalized word just lowercases) take the regex path over
    ``chunk.lower()``; everything else runs the exact char loop."""
    for chunk in text.split():
        if _TRIGGER.search(chunk) is None:
            yield from _FAST.findall(chunk)
        elif _TRIGGER_UPPER_OK.search(chunk) is None:
            yield from _FAST.findall(chunk.lower())
        else:
            for tok in parse_terms(chunk):
                yield tok.term


def index_text(
    text: str,
    prefix: str = "",
    start_pos: int = 0,
    wdf_inc: int = 1,
) -> tuple[list[tuple[str, Optional[int], int]], int]:
    """STEM_SOME emission for one text run.

    Returns ``(rows, cur_pos)`` where each row is
    ``(term, position-or-None, wdf_inc)``:

    * ``prefix + token`` with a 1-based position,
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
    for term in chunk_tokens(text):
        # byte-length cap; <=16 chars can never exceed 64 UTF-8 bytes
        if len(term) > 16 and \
                len(term.encode("utf-8")) > MAX_WORD_LENGTH:
            continue
        cur_pos += 1
        rows.append((prefix + term, cur_pos, wdf_inc))
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


def document_terms(doc: dict) -> list[tuple[str, Optional[int], int]]:
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
    out, pos = index_text(",".join(authors), "A", pos)
    rows.extend(out)
    date = doc.get("date", 0)
    out, pos = index_text(render_rfc3339(0 if date is None else date),
                          "D", pos)
    rows.extend(out)
    out, pos = index_text(_asstr(doc.get("fullpath")), "U", pos)
    rows.extend(out)
    out, pos = index_text(_asstr(doc.get("title")), "S", pos)
    rows.extend(out)
    out, pos = index_text(_asstr(doc.get("subtitle")), "XS", pos)
    rows.extend(out)
    for tag in _aslist(doc.get("tags")):
        out, pos = index_text(tag, "K", pos)
        rows.extend(out)
    out, pos = index_text(_asstr(doc.get("body")), "", pos)
    rows.extend(out)
    return rows


def document_term_rows(doc: dict) -> tuple[dict, int]:
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
        for term in chunk_tokens(text):
            if len(term) > 16 and \
                    len(term.encode("utf-8")) > MAX_WORD_LENGTH:
                continue
            pos += 1
            doclen += 1
            key = prefix + term
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
