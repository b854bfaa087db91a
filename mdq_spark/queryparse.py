"""Two-level query parser, shape-identical to the reference.

Level 1 (outer): ``parse_user_query`` splits the raw input on 12
UPPERCASE operator keywords and left-assoc folds the chunks — a port of
``take_up_to_operator`` / ``parse_user_query``
(/root/reference/src/interactive/xapian_utils.rs:578-703), including its
deliberate quirks:

* operator *detection* is case-sensitive substring search in priority
  order (the reference's nom ``alt(take_until(...))``), and matches
  inside words ("ANDROID" splits at "AND" — the TODO at
  xapian_utils.rs:687 acknowledges this);
* operator *consumption* is case-insensitive (``tag_no_case``,
  xapian_utils.rs:108-125);
* the interactive loop appends ``" ;"`` to every query before parsing
  (src/interactive.rs:414-416) so the streaming word parsers terminate —
  ``parse_user_query`` here does the same;
* the final chunk goes through the token-splitting ``expression`` path
  (quoted | tagged | word | whitespace, OR-folded, xapian_utils.rs:434-479)
  while intermediate chunks go directly to the chunk parser.

Level 2 (chunk): ``parse_chunk`` reimplements the subset of Xapian's
``QueryParser`` the reference exercises (flags at xapian_utils.rs:584-591:
Boolean | Phrase | Lovehate | BooleanAnyCase | Wildcard | PureNot |
Partial): default-OR free terms with Z-prefixed stems, quoted phrases,
implicit phrases for punctuation-joined words ("tag:meh" when the field
parse fails), +/- lovehate, any-case booleans, trailing-``*`` wildcards,
and FLAG_PARTIAL expansion of a trailing word into
``(WILDCARD SYNONYM w OR Zw@pos)``.

Golden parity fixtures: the three ``expression_tests`` at
xapian_utils.rs:481-549 must reproduce byte-identical descriptions.
"""

from __future__ import annotations

import re
from typing import Optional

from .plan import (
    ALL,
    Bool,
    MatchNothing,
    NOTHING,
    Node,
    Positional,
    Scaled,
    Term,
    ValueRange,
    Wildcard,
    combine,
)
from .stem import stem
from .tokenize import MAX_WORD_LENGTH, cjk_grams, parse_terms, _should_stem


class EmptyExpression(ValueError):
    """Raised for an empty expression (xapian_utils.rs:463-465)."""


# ---------------------------------------------------------------------------
# Level 2: chunk parser (Xapian QueryParser subset)
# ---------------------------------------------------------------------------

_BOOL_KEYWORDS = {"and": "AND", "or": "OR", "not": "NOT", "xor": "XOR"}


def _lex_chunk(text: str):
    """Lex a chunk into (kind, payload, starts_love, starts_hate, at_end).

    kinds: 'phrase' (list of token strings), 'piece' (raw whitespace-
    delimited piece), 'lparen', 'rparen', 'bool' (canonical keyword).
    ``at_end`` is True when the item's last char is the final char of the
    chunk (drives FLAG_PARTIAL).
    """
    items = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == '"':
            j = text.find('"', i + 1)
            if j < 0:
                j = n
                content = text[i + 1:]
                end = n
            else:
                content = text[i + 1:j]
                end = j + 1
            items.append(("phrase", content, False, False, end >= n))
            i = end
            continue
        if ch == "(":
            items.append(("lparen", None, False, False, False))
            i += 1
            continue
        if ch == ")":
            items.append(("rparen", None, False, False, i + 1 >= n))
            i += 1
            continue
        love = hate = False
        if ch == "+" and i + 1 < n and not text[i + 1].isspace():
            love = True
            i += 1
        elif ch == "-" and i + 1 < n and not text[i + 1].isspace():
            hate = True
            i += 1
        j = i
        while j < n and not text[j].isspace() and text[j] not in '"()':
            j += 1
        piece = text[i:j]
        if piece:
            kw = _BOOL_KEYWORDS.get(piece.lower())
            if kw and not love and not hate:
                items.append(("bool", kw, piece, False, j >= n))
            else:
                items.append(("piece", piece, love, hate, j >= n))
        i = j

    # A boolean keyword with a missing operand on either side is plain
    # text (Xapian's parser is forgiving: "and" alone is a term).
    fixed = []
    for idx, it in enumerate(items):
        if it[0] == "bool":
            has_left = any(p[0] != "bool" for p in items[:idx])
            has_right = any(p[0] != "bool" for p in items[idx + 1:])
            # FLAG_PURE_NOT: leading NOT needs no left operand
            if it[1] == "NOT":
                has_left = True
            if not (has_left and has_right):
                fixed.append(("piece", it[2], False, False, it[4]))
                continue
        fixed.append(it)
    return fixed


class _ChunkParser:
    def __init__(self, items, prefix: str, partial: bool,
                 cjk_ngram: bool = False):
        self.items = items
        self.k = 0
        self.prefix = prefix
        self.partial = partial
        self.cjk_ngram = cjk_ngram
        self.pos = 0  # query-side term position counter

    def peek(self):
        return self.items[self.k] if self.k < len(self.items) else None

    def next(self):
        it = self.items[self.k]
        self.k += 1
        return it

    # -- term construction ---------------------------------------------

    def _words_of(self, piece: str):
        """Word segments of a piece as (word, is_cjk) pairs.  With
        FLAG_CJK_NGRAM a whole CJK run is ONE segment, exactly like
        ``QueryParser::Internal::parse_term`` (queryparser_internal.cc:
        748-753); the 64-byte cap never applies to CJK runs (the parser
        splits them into <=8-byte grams, never looking up the run)."""
        return [(t.term, t.cjk)
                for t in parse_terms(piece, cjk_ngram=self.cjk_ngram,
                                     cjk_runs=self.cjk_ngram)
                if t.cjk or len(t.term.encode("utf-8")) <= MAX_WORD_LENGTH]

    def _make_term(self, word: str, capitalized: bool, in_phrase: bool) -> Term:
        self.pos += 1
        if in_phrase or capitalized or not _should_stem(word):
            return Term(self.prefix + word, self.pos)
        return Term("Z" + self.prefix + stem(word), self.pos)

    def _make_cjk_node(self, run: str) -> Node:
        """``Term::as_cjk_query`` (queryparser_internal.cc:532-548): AND
        of every gram (unigrams + bigrams, iterator order), all sharing
        ONE query position, unstemmed, prefix applied to each gram."""
        self.pos += 1
        terms = tuple(Term(self.prefix + g.term, self.pos)
                      for g in cjk_grams(run))
        if len(terms) == 1:
            return terms[0]
        return Bool("AND", terms)

    def _positional_members(self, words) -> list[Term]:
        """Phrase members: a CJK segment contributes one positional term
        per CHARACTER (``Term::as_positional_cjk_term``,
        queryparser_internal.cc:1158-1170); others one term each."""
        terms: list[Term] = []
        for w, is_cjk in words:
            if is_cjk:
                for c in w:
                    self.pos += 1
                    terms.append(Term(self.prefix + c, self.pos))
            else:
                self.pos += 1
                terms.append(Term(self.prefix + w, self.pos))
        return terms

    def _piece_node(self, piece: str, at_end: bool) -> Node:
        wildcard = piece.endswith("*")
        if wildcard:
            piece = piece[:-1]
        words = self._words_of(piece)
        if not words:
            return NOTHING
        capitalized = piece[:1].isupper()
        if wildcard and len(words) == 1 and not words[0][1]:
            self.pos += 1
            return Wildcard(self.prefix + words[0][0])
        if len(words) > 1:
            # implicit phrase: punctuation-joined words, unstemmed
            terms = self._positional_members(words)
            return Positional("PHRASE", tuple(terms), len(terms))
        word, is_cjk = words[0]
        if is_cjk:
            # CJKTERM bypasses both FLAG_WILDCARD and FLAG_PARTIAL: the
            # lexer Parse()s it before the '*'/partial handling
            # (queryparser_internal.cc:3407-3411), so "中文*" == "中文"
            return self._make_cjk_node(word)
        if self.partial and at_end:
            # FLAG_PARTIAL: trailing word -> (WILDCARD SYNONYM w OR Zw@pos)
            leaf = self._make_term(word, capitalized, in_phrase=False)
            return Bool("OR", (Wildcard(self.prefix + word), leaf))
        return self._make_term(word, capitalized, in_phrase=False)

    def _phrase_node(self, content: str) -> Node:
        words = self._words_of(content)
        if not words:
            return NOTHING
        terms = self._positional_members(words)
        if len(terms) == 1:
            return terms[0]
        return Positional("PHRASE", tuple(terms), len(terms))

    # -- grammar ---------------------------------------------------------

    def parse(self) -> Node:
        node = self.parse_or()
        return node

    def parse_or(self) -> Node:
        left = self.parse_xor()
        while True:
            it = self.peek()
            if it and it[0] == "bool" and it[1] == "OR":
                self.next()
                right = self.parse_xor()
                left = combine("OR", left, right)
            else:
                return left

    def parse_xor(self) -> Node:
        left = self.parse_and()
        while True:
            it = self.peek()
            if it and it[0] == "bool" and it[1] == "XOR":
                self.next()
                right = self.parse_and()
                left = combine("XOR", left, right)
            else:
                return left

    def parse_and(self) -> Node:
        left = self.parse_not()
        while True:
            it = self.peek()
            if it and it[0] == "bool" and it[1] == "AND":
                self.next()
                nxt = self.peek()
                if nxt and nxt[0] == "bool" and nxt[1] == "NOT":
                    self.next()
                    right = self.parse_not()
                    left = combine("AND_NOT", left, right)
                else:
                    right = self.parse_not()
                    left = combine("AND", left, right)
            elif it and it[0] == "bool" and it[1] == "NOT":
                # "foo NOT bar" == "foo AND NOT bar"
                self.next()
                right = self.parse_not()
                left = combine("AND_NOT", left, right)
            else:
                return left

    def parse_not(self) -> Node:
        it = self.peek()
        if it and it[0] == "bool" and it[1] == "NOT":
            self.next()
            right = self.parse_not()
            # FLAG_PURE_NOT: NOT x == <alldocuments> AND_NOT x
            return combine("AND_NOT", ALL, right)
        return self.parse_prob()

    def parse_prob(self) -> Node:
        regulars: list[Node] = []
        loves: list[Node] = []
        hates: list[Node] = []
        while True:
            it = self.peek()
            if it is None or it[0] == "rparen" or it[0] == "bool":
                break
            kind, payload, love, hate, at_end = self.next()
            if kind == "lparen":
                sub = self.parse_or()
                nxt = self.peek()
                if nxt and nxt[0] == "rparen":
                    self.next()
                regulars.append(sub)
                continue
            if kind == "phrase":
                node = self._phrase_node(payload)
            else:
                node = self._piece_node(payload, at_end)
            if node.is_nothing():
                continue
            (loves if love else hates if hate else regulars).append(node)
        base = NOTHING
        for r in regulars:
            base = combine("OR", base, r)
        if loves:
            lv = loves[0]
            for l in loves[1:]:
                lv = combine("AND", lv, l)
            base = combine("AND_MAYBE", lv, base) if not base.is_nothing() else lv
        if hates:
            hv = hates[0]
            for h in hates[1:]:
                hv = combine("OR", hv, h)
            base = combine("AND_NOT", base if not base.is_nothing() else ALL, hv)
        return base


def parse_chunk(text: str, prefix: str = "", partial: bool = True,
                cjk_ngram: bool = False) -> Node:
    """Xapian-QueryParser-subset parse of one chunk (``qp.parse_query``)."""
    items = _lex_chunk(text)
    if not items:
        return NOTHING
    return _ChunkParser(items, prefix, partial, cjk_ngram).parse()


# ---------------------------------------------------------------------------
# expression token splitter (xapian_utils.rs:434-479 + nom streaming quirks)
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_FIELDS = [
    ("fullpath", "U"),
    ("subtitle", "XS"),
    ("author", "A"),
    ("title", "S"),
    ("date", "D"),
    ("tag", "K"),
]


def _scan_word(text: str, i: int):
    """nom ``word``: many1(alnum|_), *streaming* — returns None
    (Incomplete) if the match runs to end-of-input."""
    m = _WORD_RE.match(text, i)
    if not m:
        return None, i, False
    if m.end() >= len(text):
        return None, i, True  # Incomplete
    return m.group(0), m.end(), False


def _scan_quoted(text: str, i: int):
    """nom ``quoted``: '"' words '"' | "'" words "'" (words = alnum/_/ws).

    Streaming: an unterminated quote that runs to end-of-input is
    Incomplete."""
    if i >= len(text) or text[i] not in "\"'":
        return None, i, False
    q = text[i]
    j = i + 1
    while j < len(text) and (text[j].isspace() or _WORD_RE.match(text[j])):
        j += 1
    if j >= len(text):
        return None, i, True  # Incomplete (never saw a closing quote)
    if text[j] != q or j == i + 1:  # words is many1: empty quotes fail
        return None, i, False
    return text[i:j + 1], j + 1, False


def _scan_tagged(text: str, i: int):
    """nom ``tagged``: word ':' (quoted|word) multispace0 — the span
    INCLUDES trailing whitespace (xapian_utils.rs:310-312)."""
    w, j, inc = _scan_word(text, i)
    if inc:
        return None, i, True
    if w is None or j >= len(text) or text[j] != ":":
        return None, i, False
    j += 1
    v, j2, inc = _scan_quoted(text, j)
    if inc:
        return None, i, True
    if v is None:
        v, j2, inc = _scan_word(text, j)
        if inc:
            return None, i, True
        if v is None:
            return None, i, False
    j = j2
    while j < len(text) and text[j].isspace():
        j += 1
    return text[i:j], j, False


def scan_expression(text: str) -> Optional[list[str]]:
    """many1(quoted | tagged | word | multispace1) — returns the token
    spans, or None when the parse fails/goes Incomplete (in which case
    the reference returns an *empty query*, xapian_utils.rs:457-460)."""
    tokens: list[str] = []
    i, n = 0, len(text)
    while i < n:
        tok, j, inc = _scan_quoted(text, i)
        if inc:
            return None
        if tok is not None:
            tokens.append(tok)
            i = j
            continue
        tok, j, inc = _scan_tagged(text, i)
        if inc:
            return None
        if tok is not None:
            tokens.append(tok)
            i = j
            continue
        tok, j, inc = _scan_word(text, i)
        if inc:
            return None
        if tok is not None:
            tokens.append(tok)
            i = j
            continue
        if text[i].isspace():
            j = i
            while j < n and text[j].isspace():
                j += 1
            tokens.append(text[i:j])
            i = j
            continue
        break  # unmatchable char: many1 stops; rest silently dropped
    return tokens if tokens else None


def _parse_field_token(token: str):
    """``XapianTag::parse`` (xapian_utils.rs:380-393): field keyword
    (case-insensitive), ':', quoted-or-word value.  Streaming: a bare
    word value that runs to the end of the token is Incomplete -> None."""
    for name, prefix in _FIELDS:
        if len(token) > len(name) and token[: len(name)].lower() == name \
                and token[len(name)] == ":":
            rest = token[len(name) + 1:]
            base = len(name) + 1
            v, j, inc = _scan_quoted(token, base)
            if inc:
                return None
            if v is not None:
                return prefix, v
            v, j, inc = _scan_word(token, base)
            if inc or v is None:
                return None
            return prefix, v
    return None


def _span_into_query(token: str, cjk_ngram: bool = False) -> Node:
    """span_into_query (xapian_utils.rs:442-453)."""
    parsed = _parse_field_token(token)
    if parsed is not None:
        prefix, value = parsed
        return parse_chunk(value, prefix=prefix, cjk_ngram=cjk_ngram)
    return parse_chunk(token, cjk_ngram=cjk_ngram)


def expression_into_query(text: str, cjk_ngram: bool = False) -> Node:
    """expression_into_query (xapian_utils.rs:455-479): split into
    tokens, parse each, OR-fold.  Whitespace-only tokens are skipped —
    except the first, which parses to an empty query (faithful quirk).

    N.B. every nom combinator here (word, quoted, tagged) only accepts
    ``[A-Za-z0-9_]`` word chars — CJK text in a FINAL chunk is an
    unmatchable char that stops ``many1`` and is silently dropped
    BEFORE Xapian's QueryParser would see it, flag or no flag
    (xapian_utils.rs:434-479).  ``cjk_ngram`` therefore only takes
    effect in intermediate chunks ("中文 AND x"), which bypass this
    layer and go straight to the chunk parser."""
    tokens = scan_expression(text)
    if tokens is None:
        return parse_chunk("")  # expression failed -> empty query
    it = iter(tokens)
    try:
        first = next(it)
    except StopIteration:
        raise EmptyExpression("Empty expression")
    query = _span_into_query(first, cjk_ngram)
    for token in it:
        if token.isspace():
            continue
        query = combine("OR", query, _span_into_query(token, cjk_ngram))
    return query


# ---------------------------------------------------------------------------
# Level 1: outer operator split (xapian_utils.rs:578-703)
# ---------------------------------------------------------------------------

# take_up_to_operator priority order (case-SENSITIVE detection)
_TAKE_ORDER = [
    "AND MAYBE", "AND NOT", "SYNONYM", "FILTER", "PHRASE", "SCALED",
    "ELITE", "RANGE", "NEAR", "AND", "XOR", "OR",
]

# matchop alternatives (case-INSENSITIVE consumption), xapian_utils.rs:108-125
_MATCHOP_ORDER = [
    ("AND MAYBE", "AND_MAYBE"), ("SYNONYM", "SYNONYM"), ("AND NOT", "AND_NOT"),
    ("FILTER", "FILTER"), ("PHRASE", "PHRASE"), ("SCALED", "SCALED"),
    ("RANGE", "RANGE"), ("ELITE", "ELITE"), ("NEAR", "NEAR"),
    ("AND", "AND"), ("XOR", "XOR"), ("OR", "OR"), (">", "GE"), ("<", "LE"),
]


def _take_up_to_operator(s: str):
    for kw in _TAKE_ORDER:
        idx = s.find(kw)
        if idx >= 0:
            return s[:idx], s[idx:]
    return None


def _matchop(s: str):
    up = s.upper()
    for kw, op in _MATCHOP_ORDER:
        if up.startswith(kw):
            return op, s[len(kw):]
    return None


_NUM_RE = re.compile(r"\s*([0-9]+(?:\.[0-9]+)?)\s*(?:;\s*)?$")


def _add_right(op: str, left: Node, right_text: str, final: bool,
               cjk_ngram: bool = False) -> Node:
    """query.add_right(op, parse(rhs)) with the reference's chunk routing:
    intermediate rhs chunks go to the chunk parser, the final chunk to
    expression_into_query (xapian_utils.rs:616-637)."""
    if op == "SCALED":
        m = _NUM_RE.match(right_text)
        if m:
            return Scaled(float(m.group(1)), left)
        # non-numeric rhs: scale is meaningless; keep left (documented)
        return left
    if op in ("RANGE", "GE", "LE"):
        # the reference never populates value slots, so value ops match
        # nothing against its index (SURVEY.md Q14): FILTER with an empty
        # value set -> MatchNothing
        return combine("FILTER", left, ValueRange(op, right_text.strip()))
    rhs = expression_into_query(right_text, cjk_ngram) if final \
        else parse_chunk(right_text, cjk_ngram=cjk_ngram)
    if op in ("PHRASE", "NEAR"):
        return combine(op, left, rhs)
    return combine(op, left, rhs)


def parse_user_query(qstr: str, append_hint: bool = True,
                     cjk_ngram: bool = False) -> Node:
    """Full user-query parse (parse_user_query, xapian_utils.rs:578-654).

    ``append_hint`` mirrors the interactive loop's ``input + " ;"``
    (src/interactive.rs:414-416); pass False to parse a raw string the
    way the reference's unit tests call expression_into_query.

    ``cjk_ngram`` enables Xapian's FLAG_CJK_NGRAM in the chunk-parser
    layer (see parse_chunk); the nom expression layer's CJK-dropping
    behavior is flag-independent (see expression_into_query).
    """
    if append_hint:
        qstr = qstr + " ;"
    first = _take_up_to_operator(qstr)
    if first is None:
        return expression_into_query(qstr, cjk_ngram)
    matched, rest = first
    query = parse_chunk(matched, cjk_ngram=cjk_ngram)
    mo = _matchop(rest)
    if mo is None:  # unreachable in reference (found op guarantees match)
        return expression_into_query(qstr, cjk_ngram)
    operator, qstr = mo

    depth = 0
    while qstr:
        depth += 1
        nxt = _take_up_to_operator(qstr)
        if nxt is None:
            query = _add_right(operator, query, qstr, final=True,
                               cjk_ngram=cjk_ngram)
            break
        matched, rest = nxt
        query = _add_right(operator, query, matched, final=False,
                           cjk_ngram=cjk_ngram)
        qstr = rest
        mo = _matchop(qstr)
        if mo is None:
            break
        operator, qstr = mo
        if depth > 50:
            raise ValueError(f"Depth limit reached with remaining '{qstr}'")
    return query
