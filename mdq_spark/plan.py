"""Logical query plan for the BM25 engine.

The reference has no logical plan of its own — it builds Xapian
``Query`` trees (``/root/reference/src/interactive/xapian_utils.rs:578-654``)
whose shapes are pinned by its golden tests (same file, lines 481-549).
These dataclasses are that tree, and ``describe()`` reproduces Xapian's
``Query::get_description()`` rendering so the reference's golden strings
are usable verbatim as parity fixtures.

Node semantics (SURVEY.md §2.4, Q6-Q17):

=========== =====================================================
OR          docid union, weights summed
AND         docid intersection, weights summed
AND_NOT     left minus right, weight from left
XOR         exactly one side matches, weight from that side
AND_MAYBE   left's docids, right only boosts weight
FILTER      right restricts, contributes no weight
SYNONYM     children act as a single term (wdf summed per doc)
ELITE       keep the N highest-termweight children, then OR
PHRASE      terms at consecutive positions in order, window W
NEAR        terms within a W-position window, any order
SCALED      multiply subquery weight by a factor
WILDCARD    dictionary prefix expansion, synonym-combined
RANGE/GE/LE value-slot comparisons — the reference never populates
            value slots so these match nothing (SURVEY.md Q14)
=========== =====================================================
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


class Node:
    def describe(self) -> str:
        raise NotImplementedError

    def is_nothing(self) -> bool:
        return False


@dataclass(frozen=True)
class MatchNothing(Node):
    """Empty query — matches nothing (Xapian's default-constructed Query)."""

    def describe(self) -> str:
        return ""

    def is_nothing(self) -> bool:
        return True


@dataclass(frozen=True)
class MatchAll(Node):
    """``<alldocuments>`` — used by PureNot rewrites; weight 0."""

    def describe(self) -> str:
        return "<alldocuments>"


@dataclass(frozen=True)
class Term(Node):
    """A single (possibly prefixed / Z-stemmed) term.

    ``pos`` is the query-side term position (1-based within one chunk
    parse); 0 means "no positional info" and suppresses the ``@pos``
    suffix exactly as Xapian's description does.
    """

    term: str
    pos: int = 0
    wqf: int = 1

    def describe(self) -> str:
        return f"{self.term}@{self.pos}" if self.pos else self.term


@dataclass(frozen=True)
class Wildcard(Node):
    """Dictionary prefix expansion (FLAG_PARTIAL / trailing ``*``).

    Combined with OP_SYNONYM like Xapian's partial expansion
    (queryparser_internal.cc:3426-3440): the expansion acts as one term
    whose per-doc wdf is the sum over matched terms.
    """

    pattern: str

    def describe(self) -> str:
        return f"WILDCARD SYNONYM {self.pattern}"


_INFIX = {
    "OR": "OR",
    "AND": "AND",
    "AND_NOT": "AND_NOT",
    "XOR": "XOR",
    "AND_MAYBE": "AND_MAYBE",
    "FILTER": "FILTER",
    "SYNONYM": "SYNONYM",
    "ELITE": "ELITE_SET 10",
}


@dataclass(frozen=True)
class Bool(Node):
    """N-ary boolean combiner; rendered as a left-assoc infix chain."""

    op: str  # key of _INFIX
    children: tuple

    def describe(self) -> str:
        inner = f" {_INFIX[self.op]} ".join(c.describe() for c in self.children)
        return f"({inner})"


@dataclass(frozen=True)
class Positional(Node):
    """PHRASE / NEAR over term leaves with a window."""

    op: str  # "PHRASE" | "NEAR"
    children: tuple  # of Term
    window: int

    def describe(self) -> str:
        inner = f" {self.op} {self.window} ".join(
            c.describe() for c in self.children
        )
        return f"({inner})"


@dataclass(frozen=True)
class Scaled(Node):
    factor: float
    child: Node

    def describe(self) -> str:
        return f"{self.factor} * {self.child.describe()}"


@dataclass(frozen=True)
class ValueRange(Node):
    """RANGE / ``>`` / ``<`` — value slots are never populated by the
    reference's index builder, so these are grammar-reachable but match
    nothing (SURVEY.md §2.4 Q14).  Kept in the plan for shape parity."""

    op: str  # "RANGE" | "GE" | "LE"
    payload: str = ""

    def describe(self) -> str:
        return f"(VALUE {self.op} {self.payload})"

    def is_nothing(self) -> bool:  # matches no documents
        return False  # keep the node visible in descriptions


NOTHING = MatchNothing()
ALL = MatchAll()


def combine(op: str, left: Node, right: Node) -> Node:
    """Binary combine with Xapian's MatchNothing simplifications.

    Mirrors the rewrites Xapian's queryinternal.cc applies when a
    subquery is an empty Query, which is how ``Query() OR x`` in the
    reference collapses to ``x``.
    """
    ln, rn = left.is_nothing(), right.is_nothing()
    if op in ("OR", "XOR", "SYNONYM", "ELITE"):
        if ln:
            return right
        if rn:
            return left
    elif op in ("AND", "FILTER", "PHRASE", "NEAR"):
        if ln or rn:
            return NOTHING
    elif op == "AND_NOT":
        if ln:
            return NOTHING
        if rn:
            return left
    elif op == "AND_MAYBE":
        if ln:
            return NOTHING
        if rn:
            return left
    if op in ("PHRASE", "NEAR"):
        # flatten term-only operands into one positional node
        kids: list = []
        window = 0
        for side in (left, right):
            if isinstance(side, Positional) and side.op == op:
                kids.extend(side.children)
            elif isinstance(side, Term):
                kids.append(side)
            else:
                # non-positional operand: degrade to AND (Xapian raises
                # UnimplementedError for non-leaf phrase operands; we
                # choose the permissive composition)
                return Bool("AND", (left, right))
        window = len(kids)
        return Positional(op, tuple(kids), window)
    return Bool(op, (left, right))


def describe_query(node: Node) -> str:
    """Top-level rendering, Xapian style: ``Query(...)``."""
    return f"Query({node.describe()})"
