"""Pure-Python single-node oracle for the whole engine.

A slow, obviously-correct, in-memory mirror of index build + query
evaluation with exactly the semantics the distributed engine must
reproduce (SURVEY.md §5.2 layer 2): same tokenizer (tokenize.py), same
BM25 math (bm25.py), same boolean/positional operator semantics as
Xapian's matcher (SURVEY.md §2.4 Q6-Q17).  Spark tests assert
rank+score identity of the distributed engine's top-k against this.

Match semantics per node (what Xapian's matcher computes):

* Term        docs containing the term; weight = termweight * sumpart
* Wildcard    dictionary prefix expansion, OP_SYNONYM-combined: acts as
              ONE term whose per-doc wdf is the sum over expanded terms
              and whose df is estimated as min(N, Σ df) over distinct
              constituent terms (Xapian also scores synonyms from
              estimated term frequencies — see _syn_df)
* OR          union, weights summed
* AND         intersection, weights summed
* AND_NOT     left minus right, left weights
* XOR         symmetric difference, weight from the matching side
* AND_MAYBE   left's docs; right adds weight where it matches
* FILTER      left ∩ right docs, left weights only
* SYNONYM     like Wildcard but over explicit children
* ELITE       keep the 10 highest-termweight children, then OR
* PHRASE      all terms, positions strictly increasing, span < window
* NEAR        all terms, any order, span < window
* SCALED      child weights * factor
* RANGE/GE/LE match nothing (reference never populates value slots)
* MatchAll    every doc, weight 0
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import product
from typing import Callable, Iterable, Optional

from . import bm25
from .plan import (
    Bool,
    MatchAll,
    MatchNothing,
    Node,
    Positional,
    Scaled,
    Term,
    ValueRange,
    Wildcard,
)
from .queryparse import parse_user_query
from .tokenize import document_terms

DEFAULT_K = 100  # Enquire::get_mset(0, 100) (xapian_utils.rs:664)


@dataclass
class OracleIndex:
    # term -> {docid: wdf}
    postings: dict = field(default_factory=dict)
    # term -> {docid: [positions]} (only unstemmed/positional rows)
    positions: dict = field(default_factory=dict)
    # docid -> doclen (sum of wdf over ALL term rows incl. Z stems — A3)
    doclen: dict = field(default_factory=dict)
    docs: dict = field(default_factory=dict)

    @property
    def N(self) -> int:
        return len(self.doclen)

    @property
    def avg_doclen(self) -> float:
        return (sum(self.doclen.values()) / self.N) if self.N else 0.0

    @classmethod
    def build(cls, docs: Iterable[dict],
              cjk_ngram: bool = False) -> "OracleIndex":
        """Index documents (dicts with doc_id/fullpath/title/... keys)."""
        idx = cls()
        idx.cjk_ngram = cjk_ngram
        for doc in docs:
            did = doc["doc_id"]
            idx.docs[did] = doc
            total = 0
            for term, pos, wdf_inc in document_terms(doc,
                                                     cjk_ngram=cjk_ngram):
                total += wdf_inc
                pl = idx.postings.setdefault(term, {})
                pl[did] = pl.get(did, 0) + wdf_inc
                if pos is not None:
                    idx.positions.setdefault(term, {}).setdefault(
                        did, []).append(pos)
            idx.doclen[did] = total
        return idx

    # -- evaluation --------------------------------------------------------

    def _lf(self) -> float:
        return bm25.len_factor(self.avg_doclen)

    def _term_weights(self, term: str, wqf: int = 1) -> dict:
        pl = self.postings.get(term)
        if not pl:
            return {}
        tw = bm25.termweight(self.N, len(pl), wqf)
        lf = self._lf()
        return {
            d: tw * (w / (bm25.K1 * (max(self.doclen[d] * lf,
                                         bm25.MIN_NORMLEN) * bm25.B
                                     + (1 - bm25.B)) + w))
            for d, w in pl.items()
        }

    def _syn_df(self, node: Node) -> int:
        """Synonym/wildcard df *estimate*: min(N, Σ df over the distinct
        constituent terms).  Xapian also scores OP_SYNONYM from estimated
        (not exact) term frequencies (SURVEY.md A4); this estimate is
        derivable from the dictionary alone, so the distributed engine
        never has to aggregate the expansion union just to get df."""
        terms: set = set()

        def walk(n: Node):
            if isinstance(n, Term):
                terms.add(n.term)
            elif isinstance(n, Wildcard):
                terms.update(self._expand(n.pattern))
            elif isinstance(n, (Bool, Positional)):
                for c in n.children:
                    walk(c)
            elif isinstance(n, Scaled):
                walk(n.child)

        walk(node)
        return min(self.N,
                   sum(len(self.postings.get(t, {})) for t in terms))

    def _synonym_weights(self, wdf_by_doc: dict, df_est: int,
                         wqf: int = 1) -> dict:
        if not wdf_by_doc or df_est <= 0:
            return {}
        tw = bm25.termweight(self.N, df_est, wqf)
        lf = self._lf()
        return {
            d: tw * (w / (bm25.K1 * (max(self.doclen[d] * lf,
                                         bm25.MIN_NORMLEN) * bm25.B
                                     + (1 - bm25.B)) + w))
            for d, w in wdf_by_doc.items()
        }

    def _expand(self, pattern: str) -> list[str]:
        return sorted(t for t in self.postings if t.startswith(pattern))

    def _collect_wdf(self, node: Node) -> dict:
        """Per-doc wdf for SYNONYM-style combination."""
        out: dict = {}
        if isinstance(node, Term):
            for d, w in self.postings.get(node.term, {}).items():
                out[d] = out.get(d, 0) + w
        elif isinstance(node, Wildcard):
            for t in self._expand(node.pattern):
                for d, w in self.postings[t].items():
                    out[d] = out.get(d, 0) + w
        elif isinstance(node, (Bool, Positional)):
            for c in node.children:
                for d, w in self._collect_wdf(c).items():
                    out[d] = out.get(d, 0) + w
        return out

    def _max_leaf_termweight(self, node: Node) -> float:
        if isinstance(node, Term):
            pl = self.postings.get(node.term, {})
            return bm25.termweight(self.N, len(pl), node.wqf) if pl else 0.0
        if isinstance(node, Wildcard):
            df_est = self._syn_df(node)
            return bm25.termweight(self.N, df_est, 1) if df_est else 0.0
        if isinstance(node, (Bool, Positional)):
            return max((self._max_leaf_termweight(c) for c in node.children),
                       default=0.0)
        if isinstance(node, Scaled):
            return node.factor * self._max_leaf_termweight(node.child)
        return 0.0

    def _positional(self, node: Positional) -> dict:
        """PHRASE / NEAR: AND + positional window check; weight = sum of
        term weights for passing docs."""
        termlists = []
        for c in node.children:
            if not isinstance(c, Term):
                return {}  # positions only exist on term leaves
            tp = self.positions.get(c.term)
            if not tp:
                return {}
            termlists.append(tp)
        candidates = set(termlists[0])
        for tp in termlists[1:]:
            candidates &= set(tp)
        if not candidates:
            return {}
        passing = set()
        for d in candidates:
            plists = [sorted(tp[d]) for tp in termlists]
            if node.op == "PHRASE":
                if self._phrase_hit(plists, node.window):
                    passing.add(d)
            else:  # NEAR
                if self._near_hit(plists, node.window):
                    passing.add(d)
        if not passing:
            return {}
        out: dict = {}
        for c in node.children:
            for d, w in self._term_weights(c.term, c.wqf).items():
                if d in passing:
                    out[d] = out.get(d, 0.0) + w
        return out

    @staticmethod
    def _phrase_hit(plists: list[list[int]], window: int) -> bool:
        """Exists strictly-increasing p1<...<pn with pn - p1 < window."""
        def rec(i: int, prev: int, first: int) -> bool:
            if i == len(plists):
                return True
            for p in plists[i]:
                if p > prev and p - first < window:
                    if rec(i + 1, p, first):
                        return True
            return False
        for p0 in plists[0]:
            if rec(1, p0, p0):
                return True
        return False

    @staticmethod
    def _near_hit(plists: list[list[int]], window: int) -> bool:
        """Exists one position per term, all distinct, span < window."""
        def rec(i: int, chosen: list[int]) -> bool:
            if i == len(plists):
                return True
            for p in plists[i]:
                if p in chosen:
                    continue
                lo = min(chosen + [p])
                hi = max(chosen + [p])
                if hi - lo < window:
                    if rec(i + 1, chosen + [p]):
                        return True
            return False
        return rec(0, [])

    def evaluate(self, node: Node) -> dict:
        """Evaluate a plan node -> {docid: weight}."""
        if isinstance(node, MatchNothing):
            return {}
        if isinstance(node, MatchAll):
            return {d: 0.0 for d in self.doclen}
        if isinstance(node, ValueRange):
            return {}
        if isinstance(node, Term):
            return self._term_weights(node.term, node.wqf)
        if isinstance(node, Wildcard):
            return self._synonym_weights(self._collect_wdf(node),
                                         self._syn_df(node))
        if isinstance(node, Scaled):
            return {d: w * node.factor
                    for d, w in self.evaluate(node.child).items()}
        if isinstance(node, Positional):
            return self._positional(node)
        if isinstance(node, Bool):
            return self._bool(node)
        raise TypeError(f"unknown node {node!r}")

    def _bool(self, node: Bool) -> dict:
        op = node.op
        if op == "SYNONYM":
            return self._synonym_weights(self._collect_wdf(node),
                                         self._syn_df(node))
        if op == "ELITE":
            kids = sorted(node.children, key=self._max_leaf_termweight,
                          reverse=True)[:10]
            out: dict = {}
            for k in kids:
                for d, w in self.evaluate(k).items():
                    out[d] = out.get(d, 0.0) + w
            return out
        sides = [self.evaluate(c) for c in node.children]
        if op == "OR":
            out = {}
            for s in sides:
                for d, w in s.items():
                    out[d] = out.get(d, 0.0) + w
            return out
        if op == "AND":
            keys = set(sides[0])
            for s in sides[1:]:
                keys &= set(s)
            return {d: sum(s[d] for s in sides) for d in keys}
        if op == "AND_NOT":
            left, right = sides[0], sides[1]
            return {d: w for d, w in left.items() if d not in right}
        if op == "XOR":
            left, right = sides[0], sides[1]
            out = {d: w for d, w in left.items() if d not in right}
            out.update({d: w for d, w in right.items() if d not in left})
            return out
        if op == "AND_MAYBE":
            left, right = sides[0], sides[1]
            return {d: w + right.get(d, 0.0) for d, w in left.items()}
        if op == "FILTER":
            left, right = sides[0], sides[1]
            return {d: w for d, w in left.items() if d in right}
        raise ValueError(f"unknown bool op {op}")

    # -- public API ----------------------------------------------------------

    def _unit_term_sets(self, node: Node) -> Optional[list]:
        """Scoring units of an OR/SYNONYM/Term/Wildcard tree as term
        sets (one per leaf postlist, mirroring count_matching_subqs);
        None when the tree has other operators."""
        if isinstance(node, Term):
            return [{node.term}]
        if isinstance(node, Wildcard):
            exp = set(self._expand(node.pattern))
            return [exp] if exp else []
        if isinstance(node, Bool) and node.op == "OR":
            units = []
            for c in node.children:
                u = self._unit_term_sets(c)
                if u is None:
                    return None
                units.extend(u)
            return units
        if isinstance(node, Bool) and node.op == "SYNONYM":
            terms: set = set()

            def walk(n: Node):
                if isinstance(n, Term):
                    terms.add(n.term)
                elif isinstance(n, Wildcard):
                    terms.update(self._expand(n.pattern))
                elif isinstance(n, (Bool, Positional)):
                    for c in n.children:
                        walk(c)
            walk(node)
            return [terms] if terms else []
        if isinstance(node, MatchNothing):
            return []
        return None

    DBL_EPSILON = bm25.DBL_EPSILON

    def percent_min_weight(self, node: Node, weights: dict,
                           percent_cutoff: int) -> Optional[float]:
        """Xapian percent-cutoff threshold (multimatch.cc:579-582,
        903-941): percent_scale = (subqs matched by the greatest-weight
        doc / total subqs) / greatest_wt; keep docs with wt >=
        (pct/100 - DBL_EPSILON) / percent_scale.  The matched-subquery
        ratio is exact for OR/SYNONYM/Term/Wildcard trees (scoring
        units); other trees use ratio 1, which equals Xapian whenever
        the greatest doc matches every leaf (AND-semantics trees always
        do)."""
        if not weights:
            return None
        gdoc, gw = min(weights.items(), key=lambda kv: (-kv[1], kv[0]))
        if gw <= 0:
            return None
        units = self._unit_term_sets(node)
        if units:
            gn = sum(1 for u in units
                     if any(gdoc in self.postings.get(t, {}) for t in u))
            ratio = gn / len(units)
        else:
            ratio = 1.0
        percent_scale = ratio / gw
        return (percent_cutoff / 100.0 - self.DBL_EPSILON) / percent_scale

    def search(
        self,
        query: str,
        k: int = DEFAULT_K,
        predicate: Optional[Callable[[dict], bool]] = None,
        offset: int = 0,
        percent_cutoff: int = 0,
    ) -> list[tuple[int, float]]:
        """Top-k (docid, score), ties broken by ascending docid
        (msetcmp.cc:50-59 — weight desc, docid asc).

        ``predicate`` is the metadata pre-filter (tag/date predicates
        pushed ahead of scoring per the north rule): docs failing it are
        excluded before ranking.  ``percent_cutoff`` mirrors
        Enquire::set_cutoff(percent) (omenquire.cc:872-876).
        """
        node = parse_user_query(query,
                                cjk_ngram=getattr(self, "cjk_ngram", False))
        weights = self.evaluate(node)
        if predicate is not None:
            weights = {d: w for d, w in weights.items()
                       if predicate(self.docs[d])}
        if percent_cutoff:
            min_wt = self.percent_min_weight(node, weights, percent_cutoff)
            if min_wt is not None:
                weights = {d: w for d, w in weights.items() if w >= min_wt}
        ranked = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[offset:offset + k]

    def suggest(self, word: str, max_edit_distance: int = 2) -> str:
        """Spelling suggestion over the in-memory lexicon (Q18): same
        fragment + ranking rules as the distributed path (spell.py)."""
        from .spell import pick_suggestion, word_fragments
        if len(word) <= 1:
            return ""
        frags = set(word_fragments(word, query_side=True))
        candidates = []
        for t, pl in self.postings.items():
            if len(t) < 2 or ("A" <= t[0] <= "Z"):
                continue  # field-prefixed / Z-stemmed terms aren't words
            shared = len(frags & set(word_fragments(t)))
            if shared:
                candidates.append((t, len(pl), shared))
        return pick_suggestion(word, candidates, max_edit_distance)

    def match_counts(self, query: str) -> dict:
        n = len(self.evaluate(parse_user_query(
            query, cjk_ngram=getattr(self, "cjk_ngram", False))))
        return {"matches_lower_bound": n, "matches_estimated": n,
                "matches_upper_bound": n}

    def collapse(self, query: str, key: str,
                 k: int = DEFAULT_K) -> list[tuple[int, object, float]]:
        """Best-scoring doc per docs[key] value, then top-k."""
        weights = self.evaluate(parse_user_query(
            query, cjk_ngram=getattr(self, "cjk_ngram", False)))
        best: dict = {}
        for d, w in sorted(weights.items(),
                           key=lambda kv: (-kv[1], kv[0])):
            kv = self.docs[d].get(key)
            kk = tuple(kv) if isinstance(kv, list) else kv
            if kk not in best:
                best[kk] = (d, kv, w)
        ranked = sorted(best.values(), key=lambda t: (-t[2], t[0]))
        return ranked[:k]
