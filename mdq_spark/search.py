"""Distributed query execution: plan tree -> Spark DataFrame pipeline.

Physical strategy (SURVEY.md §3.3 lifecycle):

1. walk the plan for needed terms / wildcard patterns;
2. one *metadata* lookup against ``dict/`` (parquet scan with ``term IN``
   + ``bucket IN`` pushdown — bucket is the partition dir, so Catalyst
   prunes partitions) -> termweights computed driver-side;
3. per-leaf ``postings/`` scans pruned the same way, decoded in an
   Arrow mapInPandas kernel (delta+varint -> doc_id/wdf/doclen columns);
4. BM25 sumpart as a *native Spark column expression* (JVM, whole-stage
   codegen — doclen is denormalized into the posting block so scoring
   needs no join);
5. boolean algebra as joins (AND=inner, AND_NOT=left_anti, FILTER=
   left_semi, AND_MAYBE=left+coalesce, XOR=full_outer, OR=union+groupBy);
6. metadata predicates (tag/date/lang...) restrict doc_ids *before*
   scoring via a semi-join at every leaf (north-rule pushdown);
7. top-k = orderBy(score desc, doc_id asc).limit(k) — Spark compiles
   this to TakeOrderedAndProject (per-partition heaps + driver merge);
8. winners -> broadcast join back to ``docs/`` for payload (S5).

Block-max pruning (O3): before decoding, posting *block metadata*
(first_doc/last_doc/block_max_part — tiny columns, the binary payload is
never read thanks to parquet column pruning) can bound each doc-range's
best possible score; blocks whose interval upper bound is below a
safe threshold θ are dropped before the expensive decode.  θ is obtained
by fully scoring the best-bounded blocks first (exact), so pruning never
changes results — verified by tests running both paths.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import bm25
from .build import term_bucket
from .codec import decode_doc_gaps, decode_positions, varint_decode
from .oracle import OracleIndex  # reuse the positional hit checkers
from .plan import (
    Bool, MatchAll, MatchNothing, Node, Positional, Scaled, Term,
    ValueRange, Wildcard,
)
from .queryparse import parse_user_query

DEFAULT_K = 100

_DECODED_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_id", LongType(), False),
    StructField("wdf", IntegerType(), False),
    StructField("doclen", IntegerType(), False),
])

_DECODED_POS_SCHEMA = StructType(
    _DECODED_SCHEMA.fields + [
        StructField("positions", ArrayType(IntegerType()), True)])


def _decode_kernel(with_positions: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                ids = decode_doc_gaps(row.doc_gaps, n).astype("int64")
                wdfs = varint_decode(row.wdfs, n).astype("int32")
                dls = varint_decode(row.doclens, n).astype("int32")
                d = {
                    "term": np.repeat(row.term, n),
                    "doc_id": ids,
                    "wdf": wdfs,
                    "doclen": dls,
                }
                f = pd.DataFrame(d)
                if with_positions:
                    if row.positions is not None:
                        pls = decode_positions(row.positions, n)
                        f["positions"] = [p.astype("int32").tolist()
                                          for p in pls]
                    else:
                        f["positions"] = [None] * n
                frames.append(f)
            if frames:
                yield pd.concat(frames)
    return fn


class Searcher:
    """Query engine over an index directory built by build_index."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 wildcard_limit: int | None = None):
        """``wildcard_limit``: optional cap on dictionary prefix
        expansion (Xapian's set_max_expansion with
        WILDCARD_LIMIT_MOST_FREQUENT semantics — keep the highest-df
        terms).  Default None = unlimited, matching the reference's
        QueryParser default; set it at 10^12-file scale where a short
        prefix could expand to millions of terms."""
        self.spark = spark
        self.wildcard_limit = wildcard_limit
        self.dir = index_dir.rstrip("/")
        with open(os.path.join(self.dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        gs = self.manifest["globalstats"]
        self.N = int(gs["n_docs"] or 0)
        self.avg_doclen = float(gs["avg_doclen"] or 0.0)
        self.doclen_lb = int(gs["doclen_lb"] or 0)
        self.lf = bm25.len_factor(self.avg_doclen)
        self.n_buckets = int(self.manifest["n_buckets"])
        self.dict = spark.read.parquet(f"{self.dir}/dict")
        self.postings = spark.read.parquet(f"{self.dir}/postings")
        self.docs = spark.read.parquet(f"{self.dir}/docs")
        self.docstats = spark.read.parquet(f"{self.dir}/docstats")
        # upsert artifacts (mdq_spark.upsert): tombstoned docs are
        # filtered after decode; dict deltas keep df/cf exact
        tomb_path = os.path.join(self.dir, "tombstones")
        self.tombstones = None
        if os.path.exists(tomb_path):
            t = spark.read.parquet(tomb_path).select("doc_id").distinct()
            self.tombstones = t if t.limit(1).count() else None
        delta_path = os.path.join(self.dir, "dict_delta")
        self.dict_delta = (spark.read.parquet(delta_path)
                           if os.path.exists(delta_path) else None)

    # -- dictionary access -------------------------------------------------

    def _dict_lookup(self, terms: list[str], patterns: list[str]) -> dict:
        """One pruned dict scan for all exact terms + prefix patterns.
        Returns {'exact': {term: row}, 'expansions': {pattern: [terms]}}."""
        conds = []
        if terms:
            buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
            conds.append(F.col("bucket").isin(buckets)
                         & F.col("term").isin(terms))
        for p in patterns:
            # prefix range scan; bucket unknown (hash of full term) so no
            # bucket pruning for wildcards — parquet min/max on the sorted
            # term column still skips row groups
            conds.append(F.col("term").startswith(p))
        if not conds:
            return {"exact": {}, "expansions": {}}
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        # a term may have several dict rows (one per upsert generation):
        # aggregate, then apply tombstone deltas so df/cf stay exact
        raw = self.dict.filter(cond).collect()
        agg: dict = {}
        for r in raw:
            d = agg.setdefault(r["term"], {"term": r["term"], "df": 0,
                                           "cf": 0, "wdf_max": 0,
                                           "bucket": r["bucket"]})
            d["df"] += int(r["df"])
            d["cf"] += int(r["cf"])
            d["wdf_max"] = max(d["wdf_max"], int(r["wdf_max"]))
        if self.dict_delta is not None and agg:
            dcond = F.col("term").isin(list(agg))
            for r in self.dict_delta.filter(dcond) \
                    .groupBy("term").agg(F.sum("ddf").alias("ddf"),
                                         F.sum("dcf").alias("dcf")) \
                    .collect():
                if r["term"] in agg:
                    agg[r["term"]]["df"] += int(r["ddf"])
                    agg[r["term"]]["cf"] += int(r["dcf"])
        agg = {t: d for t, d in agg.items() if d["df"] > 0}
        exact = {t: d for t, d in agg.items() if t in set(terms)}
        expansions = {}
        for p in patterns:
            exp = sorted(t for t in agg if t.startswith(p))
            if self.wildcard_limit and len(exp) > self.wildcard_limit:
                exp = sorted(
                    sorted(exp, key=lambda t: -agg[t]["df"])
                    [: self.wildcard_limit])
            expansions[p] = exp
        return {"exact": exact, "expansions": expansions, "all": agg}

    @staticmethod
    def _walk(node: Node, terms: set, patterns: set):
        if isinstance(node, Term):
            terms.add(node.term)
        elif isinstance(node, Wildcard):
            patterns.add(node.pattern)
        elif isinstance(node, (Bool, Positional)):
            for c in node.children:
                Searcher._walk(c, terms, patterns)
        elif isinstance(node, Scaled):
            Searcher._walk(node.child, terms, patterns)

    # -- postings access ----------------------------------------------------

    def _scan_blocks(self, terms: list[str]) -> DataFrame:
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        return self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms))

    def _decoded(self, terms: list[str], with_positions: bool = False,
                 allowed: Optional[DataFrame] = None,
                 block_ids=None) -> DataFrame:
        blocks = self._scan_blocks(terms)
        if block_ids is not None:
            blocks = blocks.filter(
                F.col("block").isin([int(b) for b in block_ids]))
        schema = _DECODED_POS_SCHEMA if with_positions else _DECODED_SCHEMA
        cols = ["term", "n", "doc_gaps", "wdfs", "doclens"]
        if with_positions:
            cols.append("positions")
        out = blocks.select(*cols).mapInPandas(
            _decode_kernel(with_positions), schema=schema)
        if self.tombstones is not None:
            out = out.join(self.tombstones, "doc_id", "left_anti")
        if allowed is not None:
            out = out.join(allowed, "doc_id", "left_semi")
        return out

    def _weight_col(self, tw) -> Column:
        """BM25 sumpart as a native column expression (whole-stage
        codegen; doclen is denormalized in the posting block so no join).
        ``tw`` may be a float (driver-computed) or a Column."""
        normlen = F.greatest(F.col("doclen") * F.lit(self.lf),
                             F.lit(bm25.MIN_NORMLEN))
        denom = F.lit(bm25.K1) * (normlen * F.lit(bm25.B)
                                  + F.lit(1.0 - bm25.B)) + F.col("wdf")
        twc = tw if isinstance(tw, Column) else F.lit(tw)
        return twc * (F.col("wdf") / denom)

    def _termweight_col(self, df_col: Column, wqf: int = 1) -> Column:
        """termweight as a column expression of a df column — used when
        df is computed inside the plan (synonym/wildcard union size) so
        no blocking .count() job is needed."""
        tw = (F.lit(float(self.N)) - df_col + 0.5) / (df_col + 0.5)
        twf = F.when(tw < 2.0, tw * 0.5 + 1.0).otherwise(tw)
        w = F.log(twf)
        if bm25.K3 != 0:
            w = w * F.lit((bm25.K3 + 1.0) * wqf / (bm25.K3 + wqf))
        return w * F.lit(bm25.K1 + 1.0)

    # -- node evaluation -----------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "doc_id bigint, weight double")

    def _eval(self, node: Node, ctx: dict) -> DataFrame:
        if isinstance(node, MatchNothing) or isinstance(node, ValueRange):
            return self._empty()
        if isinstance(node, MatchAll):
            base = self.docstats.select("doc_id", F.lit(0.0).alias("weight"))
            if self.tombstones is not None:
                base = base.join(self.tombstones, "doc_id", "left_anti")
            if ctx["allowed"] is not None:
                base = base.join(ctx["allowed"], "doc_id", "left_semi")
            return base
        if isinstance(node, Term):
            info = ctx["dict"]["exact"].get(node.term)
            if not info:
                return self._empty()
            tw = bm25.termweight(self.N, int(info["df"]), node.wqf)
            dec = self._decoded([node.term], allowed=ctx["allowed"],
                                 block_ids=ctx.get("blocks"))
            return dec.select("doc_id",
                              self._weight_col(tw).alias("weight"))
        if isinstance(node, Wildcard):
            terms = ctx["dict"]["expansions"].get(node.pattern, [])
            return self._synonym({t: 1 for t in terms}, ctx)
        if isinstance(node, Scaled):
            child = self._eval(node.child, ctx)
            return child.select(
                "doc_id", (F.col("weight") * F.lit(node.factor)
                           ).alias("weight"))
        if isinstance(node, Positional):
            return self._positional(node, ctx)
        if isinstance(node, Bool):
            return self._bool(node, ctx)
        raise TypeError(f"unknown node {node!r}")

    def _synonym(self, term_mult: dict, ctx: dict) -> DataFrame:
        """OP_SYNONYM: expansion acts as one term — per-doc wdf summed
        over subquery occurrences (a term appearing under two children
        counts twice, like Xapian's SynonymPostList), df = size of the
        docid union (exact, matching the oracle)."""
        terms = sorted(term_mult)
        if not terms:
            return self._empty()
        # synonym df is the dict-derivable estimate min(N, Σ df over the
        # distinct constituent terms) — same convention as the oracle
        # (Xapian scores OP_SYNONYM from estimated term frequencies too).
        # This keeps termweight a driver-side constant: no aggregation
        # over the expansion union just to learn its size, which at
        # 100 TB would be a full shuffle of the hottest posting lists.
        known = ctx["dict"]["all"]
        df_est = min(self.N, sum(int(known[t]["df"])
                                 for t in terms if t in known))
        if df_est <= 0:
            return self._empty()
        dec = self._decoded(terms, allowed=ctx["allowed"],
                            block_ids=ctx.get("blocks"))
        mult = F.create_map(
            *[x for t in terms
              for x in (F.lit(t), F.lit(int(term_mult[t])))])
        dec = dec.withColumn(
            "wdf", (F.col("wdf") * mult[F.col("term")]).cast("int"))
        syn = dec.groupBy("doc_id").agg(
            F.sum("wdf").cast("int").alias("wdf"),
            F.max("doclen").alias("doclen"))
        tw = bm25.termweight(self.N, df_est, 1)
        return syn.select("doc_id", self._weight_col(tw).alias("weight"))

    def _synonym_over_children(self, node: Bool, ctx: dict) -> DataFrame:
        from collections import Counter
        counts: Counter = Counter()

        def walk(n: Node):
            if isinstance(n, Term):
                counts[n.term] += 1
            elif isinstance(n, Wildcard):
                for t in ctx["dict"]["expansions"].get(n.pattern, []):
                    counts[t] += 1
            elif isinstance(n, (Bool, Positional)):
                for c in n.children:
                    walk(c)
            elif isinstance(n, Scaled):
                walk(n.child)

        walk(node)
        return self._synonym(dict(counts), ctx)

    def _positional(self, node: Positional, ctx: dict) -> DataFrame:
        """PHRASE / NEAR: per-term decoded scans joined on doc_id (the
        AND), per-child BM25 weights as JVM column expressions, and one
        Arrow batch pass for the position-window check — a single Spark
        action end-to-end, no per-doc Python grouping."""
        child_terms = []
        for c in node.children:
            if not isinstance(c, Term):
                return self._empty()
            child_terms.append(c.term)
        if any(t not in ctx["dict"]["exact"] for t in child_terms):
            return self._empty()
        distinct_terms = sorted(set(child_terms))
        col_of = {t: f"p_{i}" for i, t in enumerate(distinct_terms)}

        base = None
        for t in distinct_terms:
            d = self._decoded([t], with_positions=True,
                              allowed=ctx["allowed"],
                              block_ids=ctx.get("blocks")) \
                .select("doc_id",
                        F.col("positions").alias(col_of[t]),
                        F.col("wdf").alias(f"w_{col_of[t]}"),
                        F.col("doclen").alias(f"l_{col_of[t]}"))
            base = d if base is None else base.join(d, "doc_id")
        # weight = sum of per-child sumparts (children may repeat a term)
        weight = F.lit(0.0)
        first_len = f"l_{col_of[distinct_terms[0]]}"
        for c in node.children:
            info = ctx["dict"]["exact"][c.term]
            tw = bm25.termweight(self.N, int(info["df"]), c.wqf)
            wdf = F.col(f"w_{col_of[c.term]}")
            normlen = F.greatest(F.col(first_len) * F.lit(self.lf),
                                 F.lit(bm25.MIN_NORMLEN))
            denom = F.lit(bm25.K1) * (normlen * F.lit(bm25.B)
                                      + F.lit(1.0 - bm25.B)) + wdf
            weight = weight + F.lit(tw) * (wdf / denom)
        base = base.select("doc_id", weight.alias("weight"),
                           *[col_of[t] for t in distinct_terms])

        op, window = node.op, node.window
        order_cols = [col_of[c.term] for c in node.children]

        def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                keep = []
                for row in pdf.itertuples(index=False):
                    rd = row._asdict()
                    plists = []
                    ok = True
                    for cname in order_cols:
                        pl = rd[cname]
                        if pl is None or len(pl) == 0:
                            ok = False
                            break
                        plists.append(sorted(pl))
                    if not ok:
                        keep.append(False)
                        continue
                    if op == "PHRASE":
                        keep.append(
                            OracleIndex._phrase_hit(plists, window))
                    else:
                        keep.append(OracleIndex._near_hit(plists, window))
                yield pdf.loc[keep, ["doc_id", "weight"]]

        return base.mapInPandas(check, "doc_id bigint, weight double")

    def _bool(self, node: Bool, ctx: dict) -> DataFrame:
        op = node.op
        if op == "SYNONYM":
            return self._synonym_over_children(node, ctx)
        if op == "ELITE":
            # keep the 10 children with the highest leaf termweight
            # (wildcard leaves rank by their estimated synonym df,
            # mirroring OracleIndex._max_leaf_termweight)
            known = ctx["dict"]["all"]

            def leaf_tw(n: Node) -> float:
                if isinstance(n, Term):
                    info = ctx["dict"]["exact"].get(n.term)
                    return bm25.termweight(
                        self.N, int(info["df"]), n.wqf) if info else 0.0
                if isinstance(n, Wildcard):
                    ts = ctx["dict"]["expansions"].get(n.pattern, [])
                    df_est = min(self.N, sum(
                        int(known[t]["df"]) for t in ts if t in known))
                    return bm25.termweight(self.N, df_est, 1) \
                        if df_est else 0.0
                if isinstance(n, (Bool, Positional)):
                    return max((leaf_tw(c) for c in n.children),
                               default=0.0)
                if isinstance(n, Scaled):
                    return n.factor * leaf_tw(n.child)
                return 0.0

            def key(c):
                return leaf_tw(c)
            kids = sorted(node.children, key=key, reverse=True)[:10]
            out = None
            for c in kids:
                d = self._eval(c, ctx)
                out = d if out is None else out.unionByName(d)
            return out.groupBy("doc_id").agg(
                F.sum("weight").alias("weight")) if out is not None \
                else self._empty()
        sides = [self._eval(c, ctx) for c in node.children]
        if op == "OR":
            out = sides[0]
            for s in sides[1:]:
                out = out.unionByName(s)
            return out.groupBy("doc_id").agg(F.sum("weight").alias("weight"))
        left = sides[0]
        right = sides[1]
        if op == "AND":
            out = left
            for s in sides[1:]:
                out = out.join(s.withColumnRenamed("weight", "w2"),
                               "doc_id", "inner") \
                    .select("doc_id", (F.col("weight") + F.col("w2")
                                       ).alias("weight"))
            return out
        if op == "AND_NOT":
            return left.join(right, "doc_id", "left_anti")
        if op == "XOR":
            l2 = left.withColumnRenamed("weight", "lw")
            r2 = right.withColumnRenamed("weight", "rw")
            j = l2.join(r2, "doc_id", "full_outer")
            return j.filter(F.col("lw").isNull() | F.col("rw").isNull()) \
                .select("doc_id", F.coalesce("lw", "rw").alias("weight"))
        if op == "AND_MAYBE":
            r2 = right.withColumnRenamed("weight", "rw")
            return left.join(r2, "doc_id", "left") \
                .select("doc_id", (F.col("weight") +
                                   F.coalesce(F.col("rw"), F.lit(0.0))
                                   ).alias("weight"))
        if op == "FILTER":
            return left.join(right, "doc_id", "left_semi")
        raise ValueError(f"unknown bool op {op}")

    # -- block-max pruning (O3: distributed block-max WAND) --------------------

    def _scoring_units(self, node: Node, ctx: dict):
        """Decompose an OR/SYNONYM/Term/Wildcard-only tree into scoring
        units [(tw, {term: mult})]; returns None when the tree contains
        any other operator (pruning not applicable)."""
        if isinstance(node, Term):
            info = ctx["dict"]["exact"].get(node.term)
            if not info:
                return []
            return [(bm25.termweight(self.N, int(info["df"]), node.wqf),
                     {node.term: 1})]
        if isinstance(node, Wildcard):
            terms = ctx["dict"]["expansions"].get(node.pattern, [])
            if not terms:
                return []
            known = ctx["dict"]["all"]
            df_est = min(self.N, sum(int(known[t]["df"])
                                     for t in terms if t in known))
            return [(bm25.termweight(self.N, df_est, 1),
                     {t: 1 for t in terms})]
        if isinstance(node, Bool) and node.op == "OR":
            units = []
            for c in node.children:
                u = self._scoring_units(c, ctx)
                if u is None:
                    return None
                units.extend(u)
            return units
        if isinstance(node, Bool) and node.op == "SYNONYM":
            from collections import Counter
            counts: Counter = Counter()

            def walk(n):
                if isinstance(n, Term):
                    counts[n.term] += 1
                elif isinstance(n, Wildcard):
                    for t in ctx["dict"]["expansions"].get(n.pattern, []):
                        counts[t] += 1
                elif isinstance(n, (Bool, Positional)):
                    for cc in n.children:
                        walk(cc)
            walk(node)
            if not counts:
                return []
            known = ctx["dict"]["all"]
            df_est = min(self.N, sum(int(known[t]["df"])
                                     for t in counts if t in known))
            return [(bm25.termweight(self.N, df_est, 1), dict(counts))]
        if isinstance(node, MatchNothing):
            return []
        return None

    def _eval_pruned(self, node: Node, ctx: dict, k: int,
                     units) -> Optional[DataFrame]:
        """Block-max WAND, batch-adapted: (1) read only the tiny metadata
        columns of the query terms' posting blocks (parquet never touches
        the binary payload), (2) driver-side interval sweep sums each
        doc-range block's score upper bound Σ tw_u·Σ m_t·block_max_part_t,
        (3) exactly score the best-bounded blocks to establish θ = kth
        score, (4) decode only blocks whose bound >= θ.  Sound: a doc
        outside kept blocks scores < θ.  Bound validity for synonyms:
        f(w)=w/(c+w) is subadditive, so the per-term block-max parts sum
        to a valid synonym bound."""
        all_terms = sorted({t for _, tm in units for t in tm})
        if not all_terms:
            return None
        meta = (self._scan_blocks(all_terms)
                .select("term", "block", "n", "block_max_part")
                .collect())
        if not meta:
            return self._empty()
        by_term = {}
        for r in meta:
            by_term.setdefault(r["term"], {})[r["block"]] = r
        ub: dict = {}
        ndocs: dict = {}
        for tw, tm in units:
            for t, m in tm.items():
                for b, r in by_term.get(t, {}).items():
                    ub[b] = ub.get(b, 0.0) + tw * m * r["block_max_part"]
                    ndocs[b] = max(ndocs.get(b, 0), r["n"])
        order = sorted(ub, key=lambda b: -ub[b])
        seed, covered = [], 0
        for b in order:
            seed.append(b)
            covered += ndocs[b]
            if covered >= k:
                break
        if len(seed) == len(order):
            return None  # nothing to prune; run the plain path
        seed_ctx = dict(ctx)
        seed_ctx["blocks"] = set(seed)
        seed_rows = self._eval(node, seed_ctx) \
            .orderBy(F.desc("weight"), F.asc("doc_id")).limit(k).collect()
        if len(seed_rows) < k:
            return None  # not enough candidates to bound with
        theta = seed_rows[-1]["weight"]
        kept = {b for b in order if ub[b] >= theta} | set(seed)
        if len(kept) == len(order):
            return None
        final_ctx = dict(ctx)
        final_ctx["blocks"] = kept
        return self._eval(node, final_ctx)

    # -- public API -----------------------------------------------------------

    def query_df(self, query: str, k: int = DEFAULT_K,
                 filters: Optional[Column] = None,
                 prune: str = "auto",
                 min_weight: float = 0.0) -> DataFrame:
        """Top-k as a DataFrame (doc_id, score), ties broken by doc_id.

        ``filters`` is a pyspark Column predicate over the docs table
        (e.g. ``array_contains(col('tags'), 'rust') & (col('date') >= e)``)
        applied *before* scoring at every leaf (north-rule pushdown).

        ``prune``: 'auto' enables block-max pruning for OR/term-only
        plans when the index spans multiple doc-range blocks; 'always'
        forces it (tests); 'never' disables."""
        node = parse_user_query(query)
        terms: set = set()
        patterns: set = set()
        self._walk(node, terms, patterns)
        ctx = {
            "dict": self._dict_lookup(sorted(terms), sorted(patterns)),
            "allowed": None,
        }
        if filters is not None:
            ctx["allowed"] = self.docs.filter(filters).select("doc_id")
        weights = None
        if prune != "never" and filters is None:
            units = self._scoring_units(node, ctx)
            if units:
                min_blocks = 1 if prune == "always" else 64
                if (self.N // int(self.manifest["block_span"])) + 1 \
                        >= min_blocks or prune == "always":
                    weights = self._eval_pruned(node, ctx, k, units)
        if weights is None:
            weights = self._eval(node, ctx)
        if min_weight > 0.0:
            # weight cutoff (O5, Enquire::set_cutoff)
            weights = weights.filter(F.col("weight") >= min_weight)
        return weights.select("doc_id",
                              F.col("weight").alias("score")) \
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search(self, query: str, k: int = DEFAULT_K,
               filters: Optional[Column] = None,
               offset: int = 0) -> list[tuple[int, float]]:
        """Ranked matches; ``offset`` mirrors ``get_mset(first, maxitems)``
        pagination (omenquire.cc:554-576)."""
        df = self.query_df(query, k + offset, filters)
        if offset:
            df = df.offset(offset)
        rows = df.collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def match_counts(self, query: str,
                     filters: Optional[Column] = None) -> dict:
        """Match-count estimate API (A4): Xapian reports lower/estimate/
        upper bounds (omenquire.cc:245-287); counting is cheap for us so
        all three are the exact count."""
        node = parse_user_query(query)
        terms: set = set()
        patterns: set = set()
        self._walk(node, terms, patterns)
        ctx = {"dict": self._dict_lookup(sorted(terms), sorted(patterns)),
               "allowed": None}
        if filters is not None:
            ctx["allowed"] = self.docs.filter(filters).select("doc_id")
        n = self._eval(node, ctx).count()
        return {"matches_lower_bound": n, "matches_estimated": n,
                "matches_upper_bound": n}

    def collapse(self, query: str, key: str, k: int = DEFAULT_K,
                 filters: Optional[Column] = None) -> DataFrame:
        """Collapse (O5): keep the best-scoring doc per ``key`` column of
        the docs table (Enquire::set_collapse_key), then top-k."""
        from pyspark.sql import Window
        node = parse_user_query(query)
        terms: set = set()
        patterns: set = set()
        self._walk(node, terms, patterns)
        ctx = {"dict": self._dict_lookup(sorted(terms), sorted(patterns)),
               "allowed": None}
        if filters is not None:
            ctx["allowed"] = self.docs.filter(filters).select("doc_id")
        weights = self._eval(node, ctx)
        joined = weights.join(self.docs.select("doc_id", key), "doc_id")
        w = Window.partitionBy(key).orderBy(
            F.desc("weight"), F.asc("doc_id"))
        best = joined.withColumn("_rn", F.row_number().over(w)) \
            .filter(F.col("_rn") == 1).drop("_rn")
        return best.select("doc_id", key,
                           F.col("weight").alias("score")) \
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def batch_search(self, queries: dict, k: int = 10,
                     filters: Optional[Column] = None) -> DataFrame:
        """Evaluate a whole query log in ONE Spark action: per-query
        plans are tagged and unioned, ranked with a window per query.
        Returns (query_id, doc_id, score, rank).  This is how a training
        pipeline scores millions of queries — per-query job latency
        (~1 s floor) amortizes to throughput."""
        from pyspark.sql import Window
        tagged = None
        for qid, q in queries.items():
            node = parse_user_query(q)
            terms: set = set()
            patterns: set = set()
            self._walk(node, terms, patterns)
            ctx = {"dict": self._dict_lookup(sorted(terms),
                                             sorted(patterns)),
                   "allowed": None}
            if filters is not None:
                ctx["allowed"] = self.docs.filter(filters).select("doc_id")
            w = self._eval(node, ctx).withColumn("query_id", F.lit(qid))
            tagged = w if tagged is None else tagged.unionByName(w)
        if tagged is None:
            return self.spark.createDataFrame(
                [], "query_id string, doc_id bigint, score double, "
                    "rank int")
        win = Window.partitionBy("query_id").orderBy(
            F.desc("weight"), F.asc("doc_id"))
        return (tagged.withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
                .select("query_id", "doc_id",
                        F.col("weight").alias("score"), "rank"))

    # Serialization projections (P3, src/document.rs:248-284): which
    # fields each output mode carries.
    SERIALIZATIONS = {
        "storage": ["doc_id", "fullpath", "title", "subtitle", "authors",
                    "date", "tags", "weight", "writes", "views", "body",
                    "sha256"],
        "disk": ["doc_id", "title", "subtitle", "authors", "date", "tags",
                 "weight", "writes", "views"],
        "human": ["doc_id", "body"],
        "preview": ["doc_id", "body"],
    }

    def fetch(self, result_df: DataFrame, columns=("doc_id", "fullpath",
                                                   "title"),
              serialization: Optional[str] = None) -> DataFrame:
        """S5: materialize winners against the forward store — the k-row
        side is broadcast so the docs scan is a pruned broadcast join.
        ``serialization`` selects a reference projection (P3) instead of
        explicit columns."""
        if serialization is not None:
            columns = self.SERIALIZATIONS[serialization]
        return F.broadcast(result_df).join(self.docs, "doc_id") \
            .select(*dict.fromkeys(list(columns) + ["score"]))
