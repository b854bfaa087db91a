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


_POS_SHIFT = 32  # packed positional keys: (survivor_tag << 32) | position


def _survivor_keys(runs, perm, idx):
    """(survivor_tag << 32 | position) keys for the survivor rows
    ``idx`` (indices into the term's sorted order; idx[j] is survivor
    doc j) — positions are decoded ONLY here, after the boolean/AND
    intersection, and only at survivor indices (VERDICT r02 #3).  One
    vectorized pass per run: whole-blob varint decode, boundaries =
    cumsum(1 + wdf) (count == wdf by the tokenizer's blob layout,
    verified with a sequential fallback), then a repeat/gather +
    segmented cumsum — no per-doc array materialization for
    non-survivors."""
    import numpy as np
    SHIFT = np.int64(_POS_SHIFT)
    orig = perm[idx] if perm is not None else idx
    order2 = np.argsort(orig, kind="stable")
    sorted_orig = orig[order2]
    starts = np.zeros(len(runs) + 1, dtype=np.int64)
    np.cumsum([n for _, n, _ in runs], out=starts[1:])
    parts = []
    for ri, (blob, n, wdf_run) in enumerate(runs):
        a, b2 = np.searchsorted(sorted_orig, [starts[ri],
                                              starts[ri + 1]])
        if a == b2 or blob is None:
            continue
        local = (sorted_orig[a:b2] - starts[ri]).astype(np.int64)
        vals = varint_decode(blob).astype(np.int64)
        bnds = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(wdf_run + 1, out=bnds[1:])
        # per-doc check, not just the total: offsetting count!=wdf
        # mismatches could make the totals coincide and silently
        # decode wrong positions (ADVICE r03) — every stored count
        # varint must equal that doc's wdf
        if bnds[-1] != len(vals) or \
                not (vals[bnds[:-1]] == wdf_run).all():
            # count != wdf for this run: walk the counts instead
            bnds[0] = 0
            for k in range(n):
                bnds[k + 1] = bnds[k] + int(vals[bnds[k]]) + 1
        cnts = vals[bnds[local]]
        total = int(cnts.sum())
        if total == 0:
            continue
        seg_off = np.zeros(len(cnts), dtype=np.int64)
        np.cumsum(cnts[:-1], out=seg_off[1:])
        gather = (np.repeat(bnds[local] + 1, cnts)
                  + np.arange(total) - np.repeat(seg_off, cnts))
        g = vals[gather] + 1  # gap-1 encoding: +1 everywhere,
        g[seg_off] -= 1       # first value of a doc is absolute
        cs = np.cumsum(g)
        prev = np.repeat(cs[seg_off] - g[seg_off], cnts)
        pos = cs - prev
        tags = np.repeat(order2[a:b2].astype(np.int64), cnts)
        parts.append(pos + (tags << SHIFT))
    if not parts:
        return None
    # fast path: one run, no reorder -> tags (and so keys) are
    # already ascending; otherwise sort the packed keys
    if len(parts) == 1 and perm is None:
        return parts[0]
    return np.sort(np.concatenate(parts))


def _window_hits(op: str, window: int, order_terms: list,
                 mult: dict, keys: dict):
    """PHRASE / NEAR window check over packed survivor keys; returns
    the survivor tags with a hit, or None.

    PHRASE (greedy-minimal chain): for every start position of child 1,
    np.searchsorted finds the minimal strictly-later position of each
    next child; the minimal chain minimizes the final span, so checking
    span < window on it is exact (oracle._phrase_hit semantics).

    NEAR (count-window): a valid pick of one distinct position per
    child with span < window exists iff some window [p, p+window)
    anchored at an occurring position contains >= multiplicity(t)
    positions of every term t — distinct terms never share a position
    (one token per position) and one term's positions are strictly
    increasing, so counts are exactly selectable (oracle._near_hit
    semantics)."""
    import numpy as np
    SHIFT = np.int64(_POS_SHIFT)
    if op == "PHRASE":
        cur = keys[order_terms[0]]
        first = cur
        for t in order_terms[1:]:
            kt = keys[t]
            idx = np.searchsorted(kt, cur + 1)
            ok = idx < len(kt)
            cur, first, idx = cur[ok], first[ok], idx[ok]
            nxt = kt[idx]
            same = (nxt >> SHIFT) == (cur >> SHIFT)
            cur, first = nxt[same], first[same]
            if cur.size == 0:
                return None
        hit = np.unique(first[(cur - first) < window] >> SHIFT)
    else:  # NEAR
        starts = np.concatenate([keys[t] for t in sorted(keys)])
        ok = np.ones(starts.size, dtype=bool)
        for t, kt in keys.items():
            cnt = (np.searchsorted(kt, starts + window)
                   - np.searchsorted(kt, starts))
            ok &= cnt >= mult[t]
        hit = np.unique(starts[ok] >> SHIFT)
    return hit if hit.size else None


def _carry_block_stream(one_block):
    """mapInPandas wrapper shared by the block kernels: input partitions
    are sorted by block; Arrow batches can split a block, so the last
    block of each batch is carried into the next before grouping."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: Optional[pd.DataFrame] = None
        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if pdf.empty:
                continue
            last_block = pdf["block"].iloc[-1]
            tail = pdf["block"] == last_block
            leftover = pdf[tail]
            head = pdf[~tail]
            frames = []
            for _, grp in head.groupby("block", sort=False):
                out = one_block(grp.to_dict("records"))
                if out is not None:
                    frames.append(out)
            if frames:
                yield pd.concat(frames)
        if leftover is not None and not leftover.empty:
            out = one_block(leftover.to_dict("records"))
            if out is not None:
                yield out

    return fn


def _tree_kernel(spec_items: list, distinct: list, lf: float,
                 pos_terms: Optional[frozenset] = None):
    """Arrow kernel for the block-local OPERATOR TREE path (VERDICT r03
    #5, r04 #5): evaluates a compiled operator tree per doc-range
    block.  A doc lives in exactly one block, so EVERY boolean function
    of term membership — and every positional predicate, since
    positions live with the postings — is block-locally decidable and
    the whole tree runs in the single encoded-row exchange, replacing
    per-operator DataFrame joins (the reference evaluates these as one
    PostList merge per query too: Xapian's multimatch over
    AndNotPostList / NearPostList etc.).

    ``spec`` grammar (plain picklable tuples):

      ("empty",)                      matches nothing
      ("leaf", [member...])           union of members, weights summed —
                                      member = ("term", [t], tw) |
                                      ("syn", [t...], tw) (wildcard
                                      expansion scores as ONE term)
      ("or"|"and", [spec...])         union / intersection, weights
                                      summed (plan.py semantics)
      ("and_not"|"and_maybe"|"filter"|"xor", [l, r])
      ("scaled", factor, spec)
      ("pos", op, window, [("term", [t], tw)...])
                                      PHRASE/NEAR: AND of the members
                                      plus the vectorized position-
                                      window check, positions decoded
                                      lazily for AND survivors only

    ``pos_terms``: terms under positional nodes — only their raw
    position blobs are retained per block (decoded only at survivor
    indices by ``_survivor_keys``).

    ``spec_items`` is a list of ``(query_id, spec)``: a WHOLE QUERY LOG
    evaluates in one kernel over one exchange — posting decode, term
    membership, and BM25 denominators are computed once per block and
    shared by every query's tree (the batch_search replay path).  A
    single ``(None, spec)`` item emits plain (doc_id, weight) rows;
    tagged items prepend query_id.

    Per block: decode each term's run once, build the doc universe
    (union of all term runs) with per-doc BM25 denominators, then fold
    each tree bottom-up over boolean masks + weight vectors — all
    numpy, no per-row Python.  The weight invariant at every node:
    w == 0 outside the node's mask."""
    import numpy as np

    pos_terms = pos_terms or frozenset()

    def one_block(rows: list) -> Optional[pd.DataFrame]:
        by_term: dict = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        per_term: dict = {}
        pos_runs: dict = {}
        for t in distinct:
            rl = by_term.get(t)
            if not rl:
                continue
            ids_l, wdf_l, dl_l, runs = [], [], [], []
            for r in rl:
                n = int(r["n"])
                ids_l.append(decode_doc_gaps(r["doc_gaps"], n)
                             .astype("int64"))
                wdf_l.append(varint_decode(r["wdfs"], n).astype("int64"))
                dl_l.append(varint_decode(r["doclens"], n).astype("int64"))
                if t in pos_terms:
                    # raw blob kept; decoded lazily for survivors only
                    runs.append((r.get("positions"), n, wdf_l[-1]))
            ids = np.concatenate(ids_l)
            wdfs = np.concatenate(wdf_l)
            dls = np.concatenate(dl_l)
            perm = None
            if len(ids_l) > 1:  # upsert appends can interleave id ranges
                perm = np.argsort(ids, kind="stable")
                ids, wdfs, dls = ids[perm], wdfs[perm], dls[perm]
            per_term[t] = (ids, wdfs, dls)
            if t in pos_terms:
                pos_runs[t] = (runs, perm)
        if not per_term:
            return None

        universe = np.unique(np.concatenate(
            [v[0] for v in per_term.values()]))
        U = universe.size
        dls0 = np.zeros(U, dtype="int64")
        have = np.zeros(U, dtype=bool)
        members: dict = {}

        def member(t):
            m = members.get(t)
            if m is None:
                ids = per_term[t][0]
                idx = np.searchsorted(ids, universe)
                idx_c = np.minimum(idx, len(ids) - 1)
                m = ((idx < len(ids)) & (ids[idx_c] == universe), idx_c)
                members[t] = m
            return m

        for t in per_term:
            f, idx = member(t)
            fill = f & ~have
            dls0[fill] = per_term[t][2][idx[fill]]
            have |= fill
        cdenom = bm25.K1 * (np.maximum(dls0 * lf, bm25.MIN_NORMLEN)
                            * bm25.B + (1.0 - bm25.B))

        def eval_spec(sp):
            kind = sp[0]
            if kind == "empty":
                return np.zeros(U, dtype=bool), np.zeros(U)
            if kind == "leaf":
                m = np.zeros(U, dtype=bool)
                w = np.zeros(U)
                for mk, ts, tw in sp[1]:
                    if mk == "term":
                        t = ts[0]
                        if t not in per_term:
                            continue
                        f, idx = member(t)
                        wd = per_term[t][1][idx[f]]
                        w[f] += tw * (wd / (cdenom[f] + wd))
                        m |= f
                    else:  # synonym: wdf summed over constituents
                        ws = np.zeros(U, dtype="int64")
                        for t in ts:
                            if t not in per_term:
                                continue
                            f, idx = member(t)
                            ws[f] += per_term[t][1][idx[f]]
                        f = ws > 0
                        w[f] += tw * (ws[f] / (cdenom[f] + ws[f]))
                        m |= f
                return m, w
            if kind == "scaled":
                m, w = eval_spec(sp[2])
                return m, w * sp[1]
            if kind == "pos":
                op, window, ms = sp[1], sp[2], sp[3]
                empty = (np.zeros(U, dtype=bool), np.zeros(U))
                m = np.ones(U, dtype=bool)
                for _, ts, _ in ms:
                    if ts[0] not in per_term:
                        return empty
                    m &= member(ts[0])[0]
                if not m.any():
                    return empty
                w = np.zeros(U)
                for _, ts, tw in ms:
                    _, idx = member(ts[0])
                    wd = per_term[ts[0]][1][idx[m]]
                    w[m] += tw * (wd / (cdenom[m] + wd))
                surv = np.flatnonzero(m)
                order_terms = [ts[0] for _, ts, _ in ms]
                mult: dict = {}
                for t in order_terms:
                    mult[t] = mult.get(t, 0) + 1
                keys = {}
                for t in dict.fromkeys(order_terms):
                    _, idx = member(t)
                    runs, perm = pos_runs[t]
                    k = _survivor_keys(runs, perm, idx[surv])
                    if k is None:
                        return empty
                    keys[t] = k
                hit = _window_hits(op, window, order_terms, mult, keys)
                if hit is None:
                    return empty
                m2 = np.zeros(U, dtype=bool)
                m2[surv[hit]] = True
                return m2, np.where(m2, w, 0.0)
            subs = [eval_spec(s) for s in sp[1]]
            if kind == "or":
                m = subs[0][0].copy()
                w = subs[0][1].copy()
                for ms, ws in subs[1:]:
                    m |= ms
                    w += ws
                return m, w
            if kind == "and":
                m = subs[0][0].copy()
                w = subs[0][1].copy()
                for ms, ws in subs[1:]:
                    m &= ms
                    w += ws
                return m, np.where(m, w, 0.0)
            (ml, wl), (mr, wr) = subs
            if kind == "and_not":
                m = ml & ~mr
                return m, np.where(m, wl, 0.0)
            if kind == "and_maybe":
                return ml, np.where(ml, wl + wr, 0.0)
            if kind == "filter":
                m = ml & mr
                return m, np.where(m, wl, 0.0)
            if kind == "xor":
                m = ml ^ mr
                return m, np.where(m, wl + wr, 0.0)
            raise ValueError(f"unknown spec {kind}")

        frames = []
        for qid, sp in spec_items:
            m, w = eval_spec(sp)
            if not m.any():
                continue
            f = pd.DataFrame({"doc_id": universe[m], "weight": w[m]})
            if qid is not None:
                f.insert(0, "query_id", qid)
            frames.append(f)
        if not frames:
            return None
        return frames[0] if len(frames) == 1 else \
            pd.concat(frames, ignore_index=True)

    return _carry_block_stream(one_block)


class Searcher:
    """Query engine over an index directory built by build_index."""

    # default prefix-expansion cap: far above any realistic query's
    # useful expansion, far below what would OOM the driver on a
    # 10^12-file dictionary (the expansion is collected; this is the
    # one query-path collect whose size the corpus controls)
    DEFAULT_WILDCARD_LIMIT = 100_000

    def __init__(self, spark: SparkSession, index_dir: str,
                 wildcard_limit: int | None = DEFAULT_WILDCARD_LIMIT,
                 batch_rows_cap: int | None = 64_000_000):
        """``wildcard_limit``: cap on dictionary prefix expansion
        (Xapian's set_max_expansion with WILDCARD_LIMIT_MOST_FREQUENT
        semantics — keep the highest-df terms).  Defaults to a large
        cap so a short prefix over a billion-term dictionary cannot
        collect unbounded rows to the driver; pass None for Xapian's
        literal unlimited default (identical behavior below the cap).

        ``batch_rows_cap``: volume budget (estimated posting rows, from
        the dictionary's df sums) for one shared batch_search exchange.
        A query log whose union exceeds it is split into groups of
        bounded union volume — the amp10000 measurement showed the
        one-exchange amortization inverts once the union shuffle
        dominates (BENCH/BASELINE.md round-5 scale demo).  None
        disables grouping."""
        self.spark = spark
        self.wildcard_limit = wildcard_limit
        self.batch_rows_cap = batch_rows_cap
        # observability for tests: rows the last _dict_lookup collected
        # (bounded by len(terms) + wildcard_limit * len(patterns))
        self._last_dict_rows_collected = 0
        self.dir = index_dir.rstrip("/")
        # crash recovery: roll a half-finished compact_in_place swap
        # forward (or back) before opening (ADVICE r02)
        from .upsert import recover_swap
        recover_swap(self.dir)
        with open(os.path.join(self.dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        gs = self.manifest["globalstats"]
        self.N = int(gs["n_docs"] or 0)
        self.avg_doclen = float(gs["avg_doclen"] or 0.0)
        self.doclen_lb = int(gs["doclen_lb"] or 0)
        self.lf = bm25.len_factor(self.avg_doclen)
        self.n_buckets = int(self.manifest["n_buckets"])
        # tokenizer mode flag recorded at build time: queries must
        # parse with the same FLAG_CJK_NGRAM setting the index used
        self.cjk_ngram = bool(self.manifest.get("cjk_ngram", False))
        # MVCC visibility (format v3): only rows whose gen the manifest
        # has committed are readable — a crashed upsert's appends stay
        # invisible (the manifest write is the commit point)
        self.committed = [int(g) for g in
                          self.manifest.get("committed_gens", [])] or None

        def vis(df: DataFrame) -> DataFrame:
            if self.committed is not None and "gen" in df.columns:
                return df.filter(F.col("gen").isin(self.committed))
            return df
        # the manifest's dict_dir pointer is how fold_dict_deltas swaps
        # in a folded dictionary atomically (upsert.fold_dict_deltas)
        dict_dir = self.manifest.get("dict_dir", "dict")
        self.dict = vis(spark.read.parquet(f"{self.dir}/{dict_dir}"))
        self.postings = vis(spark.read.parquet(f"{self.dir}/postings"))
        self.docs = vis(spark.read.parquet(f"{self.dir}/docs")).drop("gen")
        self.docstats = vis(spark.read.parquet(f"{self.dir}/docstats"))
        # block-max bounds need per-block min doclen (format v3) so they
        # can be evaluated under the CURRENT 1/avgdl — stored bounds go
        # stale when an upsert shifts avg_doclen (ADVICE r01)
        self.prune_capable = "block_min_doclen" in self.postings.columns
        # upsert artifacts (mdq_spark.upsert): tombstoned docs are
        # filtered after decode; dict deltas keep df/cf exact
        tomb_path = os.path.join(self.dir, "tombstones")
        self.tombstones = None
        if os.path.exists(tomb_path):
            t = vis(spark.read.parquet(tomb_path)) \
                .select("doc_id").distinct()
            self.tombstones = t if t.limit(1).count() else None
        delta_path = os.path.join(self.dir, "dict_delta")
        self.dict_delta = (vis(spark.read.parquet(delta_path))
                           if os.path.exists(delta_path) else None)
        if self.dict_delta is not None:
            # deltas already baked into a folded dictionary must not be
            # applied twice (a crash between fold's manifest commit and
            # its delta-dir cleanup leaves them on disk — ADVICE r02)
            folded = [int(g) for g in
                      self.manifest.get("delta_folded_gens", [])]
            if folded:
                self.dict_delta = self.dict_delta.filter(
                    ~F.col("gen").isin(folded))

    # -- dictionary access -------------------------------------------------

    def _dict_scan(self, terms: list[str],
                   patterns: list[str]) -> Optional[DataFrame]:
        """The pruned dictionary scan for exact terms + prefix patterns.

        Partition pruning (format v4): the dictionary is partitioned by
        the term's first byte, so BOTH exact lookups and prefix scans
        touch only the directories of the looked-up first chars — a
        wildcard no longer reads the whole dictionary (VERDICT r02 #7).
        The tpfx restriction is a top-level conjunct so Catalyst can
        always extract it as a partition filter."""
        conds = []
        if terms:
            conds.append(F.col("term").isin(terms))
        for p in patterns:
            # prefix range scan within the first-char partition; parquet
            # min/max on the sorted term column skips row groups too
            conds.append(F.col("term").startswith(p))
        if not conds:
            return None
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        if "tpfx" in self.dict.columns:
            chars = sorted({t[0] for t in terms if t}
                           | {p[0] for p in patterns if p})
            if chars and all(t for t in terms) and all(patterns):
                cond = F.col("tpfx").isin(chars) & cond
        return self.dict.filter(cond)

    def _dict_rows_arrow(self, terms: list[str], patterns: list[str],
                         margin: Optional[int]):
        """Driver-side dictionary lookup via a pushed-down pyarrow read
        of ONLY the needed first-byte partitions — the Xapian-btree-
        lookup analog.  A per-query dictionary probe touches a handful
        of rows, and the 100-150 ms Spark job it used to cost was pure
        scheduling overhead (guide §1: per-query latency at sf1.0 was
        dominated by fixed cost, not work); the pyarrow path is 3-10 ms
        against the same files with the same term/gen predicates and
        row-group pruning off the sorted term column.  Returns a list
        of plain row dicts, or None when this path cannot serve the
        lookup faithfully (no hive-partitioned dict on local disk,
        empty term/pattern strings) — the caller then falls back to the
        Spark collect, and the hot-prefix DISTRIBUTED escalation is
        untouched (``margin`` has the same overflow semantics)."""
        if os.environ.get("MDQ_ARROW_DICT", "1") != "1":
            return None
        if any(not t for t in terms) or any(not p for p in patterns):
            return None
        dict_dir = os.path.join(
            self.dir, self.manifest.get("dict_dir", "dict"))
        try:
            import glob
            import urllib.parse
            import pyarrow.compute as pc
            import pyarrow.dataset as pads
            subdirs = [d for d in os.listdir(dict_dir)
                       if d.startswith("tpfx=")]
            if not subdirs:
                return None  # not a v4+ first-byte-partitioned dict
            want = {t[0] for t in terms} | {p[0] for p in patterns}
            files = []
            for d in subdirs:
                if urllib.parse.unquote(d[5:]) in want:
                    files.extend(glob.glob(
                        os.path.join(dict_dir, d, "*.parquet")))
            if not files:
                return []
            conds = []
            if terms:
                conds.append(pc.field("term").isin(terms))
            for p in patterns:
                conds.append(pc.starts_with(pads.field("term"), p))
            expr = conds[0]
            for c in conds[1:]:
                expr = expr | c
            if self.committed is not None:
                expr = expr & pads.field("gen").isin(self.committed)
            cols = ["term", "bucket", "df", "cf", "wdf_max"]
            dset = pads.dataset(files, format="parquet")
            if margin is not None:
                tbl = dset.head(margin, filter=expr, columns=cols)
            else:
                tbl = dset.to_table(filter=expr, columns=cols)
            return tbl.to_pylist()
        except Exception:
            return None  # any surprise -> the Spark path is the oracle

    def _dict_lookup(self, terms: list[str], patterns: list[str]) -> dict:
        """One pruned dict scan for all exact terms + prefix patterns.
        Returns {'exact': {term: row}, 'expansions': {pattern: [terms]}}.

        The driver never receives more than ``len(terms) +
        wildcard_limit × len(patterns)`` rows (ADVICE r03 medium: the
        previous code collected the full expansion and only then
        truncated).  Adaptive two-phase: the common case reads the
        pruned fragment driver-side via pyarrow (``_dict_rows_arrow``;
        the Spark CollectLimit is the fallback with identical
        semantics) and, when the margin is NOT hit, the result set is
        complete and the driver-side aggregation applies.  Only when a
        genuinely hot prefix overflows the bound does the lookup
        escalate to a fully distributed pass where gen aggregation,
        delta folding, and the most-frequent cap all run scan-side."""
        scan = self._dict_scan(terms, patterns)
        if scan is None:
            return {"exact": {}, "expansions": {}, "all": {}}
        cap = self.wildcard_limit
        margin: Optional[int] = None
        if patterns and cap:
            # the raw scan yields up to one row per committed
            # GENERATION per term (upsert appends), so the completeness
            # margin scales by the gen count — otherwise a benign
            # multi-gen index would spuriously trip the distributed
            # escalation on patterns well under the limit (ADVICE r04).
            # committed_gens is driver-small (bounded by upserts since
            # the last compact), so the collect stays bounded.
            n_gens = max(1, len(self.committed or [0]))
            margin = (len(terms) + cap * len(patterns)) * n_gens + 1
        raw = self._dict_rows_arrow(terms, patterns, margin)
        if raw is None:
            if margin is not None:
                raw = scan.limit(margin).collect()
            else:
                # exact-only, or explicit unlimited expansion
                raw = scan.collect()
        if margin is not None and len(raw) >= margin:
            return self._dict_lookup_distributed(scan, terms, patterns)
        self._last_dict_rows_collected = len(raw)
        # a term may have several dict rows (one per upsert
        # generation): aggregate, then apply tombstone deltas so
        # df/cf stay exact
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
        tset = set(terms)
        exact = {t: d for t, d in agg.items() if t in tset}
        expansions: dict = {}
        for p in patterns:
            exp = sorted(t for t in agg if t.startswith(p))
            if cap and len(exp) > cap:
                exp = sorted(sorted(exp, key=lambda t: (-agg[t]["df"],
                                                        t))[:cap])
            expansions[p] = exp
        return {"exact": exact, "expansions": expansions, "all": agg}

    def _dict_lookup_distributed(self, scan: DataFrame,
                                 terms: list[str],
                                 patterns: list[str]) -> dict:
        """Escalation path for hot prefixes: tag each dict row with
        every lookup it serves ('' = exact, or the matching pattern),
        aggregate gens, fold deltas, and cap each pattern's expansion
        to the ``wildcard_limit`` highest-df terms — all before the
        (bounded) collect."""
        from pyspark.sql import Window
        tag_whens = []
        if terms:
            tag_whens.append(F.when(F.col("term").isin(terms), F.lit("")))
        for p in patterns:
            tag_whens.append(
                F.when(F.col("term").startswith(p), F.lit(p)))
        tags = F.array_compact(F.array(*tag_whens))
        rows = scan.select("term", "bucket", "df", "cf", "wdf_max",
                           F.explode(tags).alias("tag"))
        agg_df = rows.groupBy("tag", "term").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf"),
            F.max("wdf_max").alias("wdf_max"),
            F.first("bucket").alias("bucket"))
        if self.dict_delta is not None:
            d = self.dict_delta.groupBy("term").agg(
                F.sum("ddf").alias("ddf"), F.sum("dcf").alias("dcf"))
            agg_df = (agg_df.join(d, "term", "left")
                      .withColumn("df", F.col("df")
                                  + F.coalesce(F.col("ddf"), F.lit(0)))
                      .withColumn("cf", F.col("cf")
                                  + F.coalesce(F.col("dcf"), F.lit(0)))
                      .drop("ddf", "dcf"))
        agg_df = agg_df.filter(F.col("df") > 0)
        if self.wildcard_limit:
            # WILDCARD_LIMIT_MOST_FREQUENT: per pattern keep the
            # highest-df terms, ties by term — identical ranking to
            # the old driver-side truncation, now inside the scan
            w = Window.partitionBy("tag").orderBy(
                F.desc("df"), F.asc("term"))
            agg_df = (agg_df.withColumn("_rn", F.row_number().over(w))
                      .filter((F.col("tag") == "")
                              | (F.col("_rn") <= self.wildcard_limit))
                      .drop("_rn"))
        collected = agg_df.collect()
        self._last_dict_rows_collected = len(collected)
        allmap: dict = {}
        exact: dict = {}
        expansions: dict = {p: [] for p in patterns}
        for r in collected:
            d = {"term": r["term"], "df": int(r["df"]),
                 "cf": int(r["cf"]), "wdf_max": int(r["wdf_max"]),
                 "bucket": r["bucket"]}
            allmap[r["term"]] = d
            if r["tag"] == "":
                exact[r["term"]] = d
            else:
                expansions[r["tag"]].append(r["term"])
        for p in expansions:
            expansions[p] = sorted(expansions[p])
        return {"exact": exact, "expansions": expansions, "all": allmap}

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
                 block_ids=None, blocks_df=None) -> DataFrame:
        blocks = self._scan_blocks(terms)
        if block_ids is not None:
            blocks = blocks.filter(
                F.col("block").isin([int(b) for b in block_ids]))
        if blocks_df is not None:
            # kept-block set too large for a pushed-down IN-list: apply
            # it as a broadcast semi-join (VERDICT r02 #1 cap)
            blocks = blocks.join(F.broadcast(blocks_df), "block",
                                 "left_semi")
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
            # the forward store, not docstats: a doc that emitted zero
            # terms (impossible today — U/D field terms are
            # unconditional — but allowed by the data model) must still
            # match <alldocuments> (ADVICE r04)
            base = self.docs.select("doc_id", F.lit(0.0).alias("weight"))
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
                                block_ids=ctx.get("blocks"),
                                blocks_df=ctx.get("blocks_df"))
            return dec.select("doc_id",
                              self._weight_col(tw).alias("weight"))
        if isinstance(node, Wildcard):
            merged = self._block_eval_tree(node, ctx)
            if merged is not None:
                return merged
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
                            block_ids=ctx.get("blocks"),
                            blocks_df=ctx.get("blocks_df"))
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

    def _compile_block_spec(self, node: Node, ctx: dict):
        """Compile a plan tree into a ``_tree_kernel`` spec, or None
        when the tree isn't block-local — today only MatchAll (docs
        with no query term in a block aren't in its posting universe).
        Positional nodes compile to 'pos' specs (VERDICT r04 #5), so
        ``"a b" AND NOT c`` folds into the same single exchange as pure
        boolean trees.  OR of pure leaves flattens into one 'leaf' spec
        — identical weights (union + sum), fewer masks."""
        known = ctx["dict"]["all"]

        def leaf_member(leaf):
            if isinstance(leaf, Term):
                info = ctx["dict"]["exact"].get(leaf.term)
                if not info:
                    return None
                return ("term", [leaf.term], bm25.termweight(
                    self.N, int(info["df"]), leaf.wqf))
            ts = ctx["dict"]["expansions"].get(leaf.pattern, [])
            df_est = min(self.N, sum(int(known[t]["df"])
                                     for t in ts if t in known))
            if df_est <= 0:
                return None
            return ("syn", ts, bm25.termweight(self.N, df_est, 1))

        if isinstance(node, (Term, Wildcard)):
            m = leaf_member(node)
            return ("leaf", [m]) if m else ("empty",)
        if isinstance(node, (MatchNothing, ValueRange)):
            return ("empty",)
        if isinstance(node, Positional):
            members = []
            for c in node.children:
                if not isinstance(c, Term):
                    return None  # positions live on term leaves only
                info = ctx["dict"]["exact"].get(c.term)
                if not info:
                    return ("empty",)  # child matches nothing
                members.append(("term", [c.term], bm25.termweight(
                    self.N, int(info["df"]), c.wqf)))
            return ("pos", node.op, node.window, members)
        if isinstance(node, Scaled):
            sub = self._compile_block_spec(node.child, ctx)
            if sub is None:
                return None
            return ("scaled", node.factor, sub)
        if isinstance(node, Bool):
            if node.op in ("OR", "AND"):
                subs = []
                for c in node.children:
                    s = self._compile_block_spec(c, ctx)
                    if s is None:
                        return None
                    subs.append(s)
                if node.op == "OR":
                    # flatten leaf children into one union group and
                    # drop empties (OR identity)
                    members, rest = [], []
                    for s in subs:
                        if s[0] == "leaf":
                            members.extend(s[1])
                        elif s[0] != "empty":
                            rest.append(s)
                    if members:
                        rest.insert(0, ("leaf", members))
                    if not rest:
                        return ("empty",)
                    return rest[0] if len(rest) == 1 else ("or", rest)
                if any(s[0] == "empty" for s in subs):
                    return ("empty",)  # AND absorbing element
                return ("and", subs)
            if node.op in ("AND_NOT", "AND_MAYBE", "FILTER", "XOR") \
                    and len(node.children) == 2:
                l = self._compile_block_spec(node.children[0], ctx)
                r = self._compile_block_spec(node.children[1], ctx)
                if l is None or r is None:
                    return None
                if l[0] == "empty":
                    return r if node.op == "XOR" else ("empty",)
                if r[0] == "empty":
                    # x AND_NOT/AND_MAYBE/XOR nothing = x;
                    # x FILTER nothing = nothing (plan.combine)
                    return ("empty",) if node.op == "FILTER" else l
                return (node.op.lower(), [l, r])
        return None

    @staticmethod
    def _spec_terms(spec, out: set, pos_out: Optional[set] = None):
        if spec[0] == "leaf":
            for _, ts, _ in spec[1]:
                out.update(ts)
        elif spec[0] == "pos":
            for _, ts, _ in spec[3]:
                out.update(ts)
                if pos_out is not None:
                    pos_out.update(ts)
        elif spec[0] == "scaled":
            Searcher._spec_terms(spec[2], out, pos_out)
        elif spec[0] in ("or", "and", "and_not", "and_maybe",
                         "filter", "xor"):
            for s in spec[1]:
                Searcher._spec_terms(s, out, pos_out)

    def _block_eval_tree(self, node: Node, ctx: dict) \
            -> Optional[DataFrame]:
        """Evaluate a block-local boolean tree in ONE exchange: scan the
        encoded posting rows of every referenced term, shuffle once on
        the doc-range block key, fold the whole operator tree inside
        the Arrow kernel.  Returns None when the tree isn't compilable
        (caller falls back to per-operator joins)."""
        spec = self._compile_block_spec(node, ctx)
        if spec is None:
            return None
        terms: set = set()
        pos_terms: set = set()
        self._spec_terms(spec, terms, pos_terms)
        if spec == ("empty",) or not terms:
            return self._empty()
        blocks = self._scan_blocks(sorted(terms))
        if ctx.get("blocks") is not None:
            blocks = blocks.filter(
                F.col("block").isin([int(b) for b in ctx["blocks"]]))
        if ctx.get("blocks_df") is not None:
            blocks = blocks.join(F.broadcast(ctx["blocks_df"]), "block",
                                 "left_semi")
        cols = ["block", "term", "n", "doc_gaps", "wdfs", "doclens"]
        if pos_terms:
            # the binary positions column rides the exchange only when
            # a positional node needs it (and is decoded only at AND-
            # survivor indices inside the kernel)
            cols.append("positions")
        enc = self._block_grouped(blocks.select(*cols), terms, ctx)
        out = enc.mapInPandas(
            _tree_kernel([(None, spec)], sorted(terms), self.lf,
                         frozenset(pos_terms)),
            "doc_id bigint, weight double")
        if self.tombstones is not None:
            out = out.join(self.tombstones, "doc_id", "left_anti")
        if ctx["allowed"] is not None:
            out = out.join(ctx["allowed"], "doc_id", "left_semi")
        return out

    # below this estimated posting volume (Σ df over the scan's terms,
    # read off the dictionary rows already in hand) the tree kernel's
    # block exchange is skipped: the whole pruned scan collapses into
    # ONE task (coalesce + local sort), because shuffling ~a megabyte
    # across the cluster costs more scheduling than one core's decode.
    # Volume-driven, so it self-disables at scale: hot terms at 10^9+
    # docs blow past the bound and keep the parallel exchange.
    LOCAL_EVAL_ROWS = 2_000_000

    def _block_grouped(self, enc: DataFrame, terms, ctx: dict) -> DataFrame:
        """Group encoded posting rows by doc-range block for the tree
        kernel: a hash exchange on ``block`` in general, a single-task
        local sort when the dictionary proves the volume is tiny
        (guide §2.4 — remove shuffles outright when they don't pay)."""
        known = ctx["dict"]["all"]
        vol = sum(int(known[t]["df"]) for t in terms if t in known)
        cap = int(os.environ.get("MDQ_LOCAL_EVAL_ROWS",
                                 str(self.LOCAL_EVAL_ROWS)))
        if vol <= cap:
            return enc.coalesce(1).sortWithinPartitions("block")
        return enc.repartition("block").sortWithinPartitions("block")

    def _positional(self, node: Positional, ctx: dict) -> DataFrame:
        """PHRASE / NEAR via the block-local tree kernel: positions are
        only decoded for docs that survive the AND intersection, and
        the window check is vectorized (no per-row Python).  Since r5
        this is the same kernel boolean trees use, so a positional node
        anywhere in a tree still evaluates in one exchange."""
        out = self._block_eval_tree(node, ctx)
        return out if out is not None else self._empty()

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
            if not kids:
                return self._empty()
            # the kept-children set is decided driver-side; their union
            # (weights summed — OR semantics) then folds into the SAME
            # single tree-kernel exchange as any other boolean tree
            # (VERDICT r05 #6: previously each kept child ran its own
            # _eval + union, N exchanges for N distinct-shape children)
            merged = self._block_eval_tree(Bool("OR", tuple(kids)), ctx)
            if merged is not None:
                return merged
            out = None
            for c in kids:
                d = self._eval(c, ctx)
                out = d if out is None else out.unionByName(d)
            return out.groupBy("doc_id").agg(
                F.sum("weight").alias("weight")) if out is not None \
                else self._empty()
        if op in ("AND", "OR", "AND_NOT", "AND_MAYBE", "FILTER", "XOR"):
            # block-local operator tree: the WHOLE tree (not just
            # AND/pure-OR) folds inside one encoded-row exchange when
            # every leaf is a Term/Wildcard/Positional — a doc lives in
            # exactly one doc-range block, so any boolean function of
            # term membership and any positional predicate is block-
            # locally decidable (VERDICT r03 #5, r04 #5)
            merged = self._block_eval_tree(node, ctx)
            if merged is not None:
                return merged
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

    # driver-side block-id collects are capped at a CONSTANT: beyond
    # this the IN-list stops paying for itself and the plain path (or a
    # broadcast semi-join) is used instead — the sweep itself never
    # collects per-(term, block) metadata rows (VERDICT r02 #1)
    PRUNE_COLLECT_CAP = 4096

    def _eval_pruned(self, node: Node, ctx: dict, k: int,
                     units, force: bool = False) -> Optional[DataFrame]:
        """Block-max WAND, batch-adapted — the bound sweep is a
        DataFrame aggregation, NOT a driver collect (VERDICT r02 #1:
        per-(term, block) metadata grows as N/block_span — ~15M rows per
        hot term at 10^12 docs — so sweeping it in driver Python was the
        one remaining driver-memory wall):

        1. scan only the tiny metadata columns of the query terms'
           posting blocks (parquet never touches the binary payload);
        2. per (term, block): bound part = max over gen rows, doc count
           = sum (upsert appends duplicate (term, block) rows);
        3. per block: ub(b) = Σ_t coef(t)·part(t, b) via a broadcast
           coefficient map (coef(t) = Σ_u tw_u·m_u(t) — query terms
           only, driver-small by construction), nd(b) = max_t count —
           all inside ONE groupBy pipeline;
        4. collect ONLY the best-bounded blocks (ub desc) until they
           cover k docs — a handful of rows — and score them exactly to
           establish θ = kth score;
        5. keep blocks with ub >= θ: collected as ids when under a
           constant cap (parquet pushes the IN-list down), else applied
           as a broadcast semi-join — either way the driver never holds
           more than PRUNE_COLLECT_CAP block ids.

        Sound: a doc outside kept blocks scores < θ.  Bound validity
        for synonyms: f(w)=w/(c+w) is subadditive, so per-term block
        bounds sum to a valid synonym bound.

        Upsert-safe (ADVICE r01): bounds are computed from the stored
        block_max_wdf + block_min_doclen under the CURRENT 1/avgdl —
        never from the stale build-time block_max_part."""
        if not self.prune_capable:
            return None
        all_terms = sorted({t for _, tm in units for t in tm})
        if not all_terms:
            return None
        coef: dict = {}
        for tw, tm in units:
            for t, m in tm.items():
                coef[t] = coef.get(t, 0.0) + tw * m
        coef_col = F.create_map(
            *[x for t, c in coef.items()
              for x in (F.lit(t), F.lit(float(c)))])
        # bm25.maxpart with tw=1 as a native column expression
        normlen = F.greatest(F.col("block_min_doclen") * F.lit(self.lf),
                             F.lit(bm25.MIN_NORMLEN))
        denom = F.lit(bm25.K1) * (normlen * F.lit(bm25.B)
                                  + F.lit(1.0 - bm25.B)) \
            + F.col("block_max_wdf")
        part = F.col("block_max_wdf") / denom
        per_block = (self._scan_blocks(all_terms)
                     .select("term", "block", "n",
                             part.alias("part"))
                     .groupBy("term", "block")
                     .agg(F.max("part").alias("bpart"),
                          F.sum("n").alias("nd_t"))
                     .withColumn("contrib",
                                 coef_col[F.col("term")] * F.col("bpart"))
                     .groupBy("block")
                     .agg(F.sum("contrib").alias("ub"),
                          F.max("nd_t").alias("nd"))
                     .persist())
        try:
            totals = per_block.agg(
                F.count("block").alias("nb"),
                F.sum("nd").alias("docs_ub"),
                F.min("ub").alias("ub_lo"),
                F.max("ub").alias("ub_hi")).collect()[0]
            n_blocks = int(totals["nb"])
            if n_blocks == 0:
                return self._empty()
            # degenerate bound distribution (every block's upper bound
            # identical — uniformly replicated corpora, WAND's worst
            # case): θ ≤ max achievable score ≤ that shared bound, so
            # the kept set is provably ALL blocks and the seed-scoring
            # pass would be pure waste — bail to the plain path before
            # paying it (round 6; the same conclusion was previously
            # reached only after 2-3 extra jobs).  Not under
            # prune='always' so tests still exercise the full sweep.
            if not force and n_blocks > 1 and \
                    float(totals["ub_lo"]) == float(totals["ub_hi"]):
                return None
            # decode-bytes auto-tune (ROADMAP r03): when the whole
            # candidate set is already small, decoding it outright is
            # cheaper than the seed-scoring pass — skip pruning.  Not
            # applied under prune='always' so the pruning path stays
            # test-covered on tiny fixtures.
            if not force and int(totals["docs_ub"] or 0) <= \
                    max(64 * k, 8192):
                return None
            # seed: best-bounded blocks until k docs are covered.  One
            # block usually suffices (nd up to block_span >= k); the
            # budget doubles on the rare shortfall.
            budget = 32
            seed: list = []
            while True:
                top = per_block.orderBy(F.desc("ub"), F.asc("block")) \
                    .limit(budget).collect()
                seed, covered = [], 0
                for r in top:
                    seed.append(int(r["block"]))
                    covered += int(r["nd"])
                    if covered >= k:
                        break
                if covered >= k or len(top) >= n_blocks:
                    break
                budget *= 2
            if len(seed) >= n_blocks:
                return None  # nothing to prune; run the plain path
            seed_ctx = dict(ctx)
            seed_ctx["blocks"] = set(seed)
            seed_rows = self._eval(node, seed_ctx) \
                .orderBy(F.desc("weight"), F.asc("doc_id")) \
                .limit(k).collect()
            if len(seed_rows) < k:
                return None  # not enough candidates to bound with
            theta = seed_rows[-1]["weight"]
            kept_df = per_block.filter(F.col("ub") >= theta) \
                .select("block")
            n_kept = kept_df.count()
            # observability (scripts/prune_stats.py): how much of the
            # candidate volume the bound sweep eliminated
            self._last_prune_stats = {
                "n_blocks": n_blocks, "seed": len(seed),
                "kept": n_kept,
                "docs_ub": int(totals["docs_ub"] or 0),
                "theta": float(theta),
            }
            if n_kept >= n_blocks:
                return None
            final_ctx = dict(ctx)
            if n_kept <= self.PRUNE_COLLECT_CAP:
                final_ctx["blocks"] = {int(r["block"])
                                       for r in kept_df.collect()} \
                    | set(seed)
            else:
                seed_df = self.spark.createDataFrame(
                    [(b,) for b in seed], "block bigint")
                # materialize NOW: the finally-block unpersist below
                # runs before the returned plan ever executes, so
                # without this the kept_df lineage (the whole posting-
                # metadata aggregation) would recompute at final query
                # time — exactly in the large-kept-set case the persist
                # targets (ADVICE r03)
                final_ctx["blocks_df"] = \
                    kept_df.unionByName(seed_df).distinct() \
                    .localCheckpoint(eager=True)
            return self._eval(node, final_ctx)
        finally:
            per_block.unpersist()

    def percent_min_wt(self, node: Node, ctx: dict, weights: DataFrame,
                       percent_cutoff: int) -> Optional[float]:
        """Xapian percent-cutoff threshold (multimatch.cc:579-582,
        903-941): percent_scale = (subqueries matched by the
        greatest-weight doc / total subqueries) / greatest weight; keep
        docs with weight >= (pct/100 - DBL_EPSILON) / percent_scale.
        The matched-subquery count is exact for unit-decomposable trees
        (one tiny pruned scan of the greatest doc's terms); other trees
        use ratio 1, which equals Xapian whenever the greatest doc
        matches every leaf (always true for AND-semantics trees)."""
        top = weights.orderBy(F.desc("weight"), F.asc("doc_id")) \
            .limit(1).collect()
        if not top or top[0]["weight"] <= 0:
            return None
        gdoc, gw = top[0]["doc_id"], top[0]["weight"]
        units = self._scoring_units(node, ctx)
        if units:
            all_terms = sorted({t for _, tm in units for t in tm})
            # the greatest doc lives in exactly one doc-range block, so
            # only that block of each term needs decoding (a full
            # posting scan here would read every block at 10^12 docs)
            gblock = int(gdoc) // int(self.manifest["block_span"])
            present = {r["term"] for r in
                       self._decoded(all_terms, block_ids=[gblock])
                       .filter(F.col("doc_id") == gdoc)
                       .select("term").distinct().collect()}
            gn = sum(1 for _, tm in units if any(t in present for t in tm))
            ratio = gn / len(units)
        else:
            ratio = 1.0
        return (percent_cutoff / 100.0 - bm25.DBL_EPSILON) / (ratio / gw)

    # -- public API -----------------------------------------------------------

    def query_df(self, query: str, k: int = DEFAULT_K,
                 filters: Optional[Column] = None,
                 prune: str = "auto",
                 min_weight: float = 0.0,
                 percent_cutoff: int = 0) -> DataFrame:
        """Top-k as a DataFrame (doc_id, score), ties broken by doc_id.

        ``filters`` is a pyspark Column predicate over the docs table
        (e.g. ``array_contains(col('tags'), 'rust') & (col('date') >= e)``)
        applied *before* scoring at every leaf (north-rule pushdown).

        ``prune``: 'auto' enables block-max pruning for OR/term-only
        plans when the index spans multiple doc-range blocks; 'always'
        forces it (tests); 'never' disables.

        ``percent_cutoff`` mirrors Enquire::set_cutoff(percent)
        (omenquire.cc:872-876, multimatch.cc:579-582/903-941): keep
        docs whose weight >= (pct/100 - DBL_EPSILON) / percent_scale,
        where percent_scale = (subqueries matched by the greatest-weight
        doc / total subqueries) / greatest weight.  Disables pruning —
        the cutoff floor can sit below the top-k pruning threshold."""
        node = parse_user_query(query, cjk_ngram=self.cjk_ngram)
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
        if prune != "never" and filters is None and not percent_cutoff:
            units = self._scoring_units(node, ctx)
            if units:
                min_blocks = 1 if prune == "always" else 64
                if (self.N // int(self.manifest["block_span"])) + 1 \
                        >= min_blocks or prune == "always":
                    weights = self._eval_pruned(
                        node, ctx, k, units, force=(prune == "always"))
        if weights is None:
            weights = self._eval(node, ctx)
        if percent_cutoff:
            min_wt = self.percent_min_wt(node, ctx, weights,
                                         percent_cutoff)
            if min_wt is not None:
                weights = weights.filter(F.col("weight") >= min_wt)
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
        node = parse_user_query(query, cjk_ngram=self.cjk_ngram)
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
        node = parse_user_query(query, cjk_ngram=self.cjk_ngram)
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
        """Evaluate a whole query log in ONE Spark action, ranked with
        a window per query.  Returns (query_id, doc_id, score, rank).
        This is how a training pipeline scores millions of queries —
        per-query job latency (~1 s floor) amortizes to throughput.

        Scale shape: the dictionary is consulted in ONE scan for the
        union of every query's terms and patterns (VERDICT r01 #7),
        and — new in r5 — every compilable query's tree evaluates
        inside ONE shared tree-kernel pass over ONE posting exchange:
        the scan covers the union of all queries' terms, and per block
        the posting decode, term membership, and BM25 denominators are
        computed once and reused by every query's spec.  A 10k-query
        log therefore costs one exchange + one decode of the union
        posting set, not 10k of each.  Queries whose tree isn't
        block-local (MatchAll shapes) fall back to per-query plans and
        union in.

        Volume cap (round 5, from the amp10000 measurement): ONE
        exchange is only a win while per-job overhead dominates; once
        the union posting volume is shuffle-bound the amortization
        inverts (13.9 vs 10.6 s/query at 3.56B postings).  The log is
        therefore split into groups whose estimated union volume
        (Σ df over the group's distinct terms, read off the dictionary
        rows already collected) stays under ``batch_rows_cap``; each
        group still shares one exchange, results are identical by
        construction (specs are independent — grouping only changes
        which exchange carries them)."""
        from pyspark.sql import Window
        nodes: dict = {}
        terms: set = set()
        patterns: set = set()
        for qid, q in queries.items():
            nodes[qid] = parse_user_query(q, cjk_ngram=self.cjk_ngram)
            self._walk(nodes[qid], terms, patterns)
        shared_dict = self._dict_lookup(sorted(terms), sorted(patterns))
        allowed = (self.docs.filter(filters).select("doc_id")
                   if filters is not None else None)
        ctx = {"dict": shared_dict, "allowed": allowed}
        spec_items: list = []
        rest: dict = {}
        for qid, node in nodes.items():
            spec = self._compile_block_spec(node, ctx)
            if spec is None:
                rest[qid] = node
            elif spec != ("empty",):
                spec_items.append((str(qid), spec))
        tagged = None
        for group in self._batch_groups(spec_items, ctx):
            g_terms: set = set()
            g_pos: set = set()
            for _qid, spec in group:
                self._spec_terms(spec, g_terms, g_pos)
            if not g_terms:
                continue
            blocks = self._scan_blocks(sorted(g_terms))
            cols = ["block", "term", "n", "doc_gaps", "wdfs", "doclens"]
            if g_pos:
                cols.append("positions")
            enc = self._block_grouped(blocks.select(*cols), g_terms, ctx)
            out = enc.mapInPandas(
                _tree_kernel(group, sorted(g_terms), self.lf,
                             frozenset(g_pos)),
                "query_id string, doc_id bigint, weight double")
            if self.tombstones is not None:
                out = out.join(self.tombstones, "doc_id", "left_anti")
            if allowed is not None:
                out = out.join(allowed, "doc_id", "left_semi")
            tagged = out if tagged is None else tagged.unionByName(out)
        for qid, node in rest.items():
            w = self._eval(node, ctx) \
                .withColumn("query_id", F.lit(str(qid)))
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

    def _batch_groups(self, spec_items: list, ctx: dict) -> list:
        """Split compiled batch specs into exchange groups of bounded
        estimated union volume (Σ df over each group's DISTINCT terms —
        shared terms cost a group nothing twice, so the packing charges
        only the increment).  Greedy in log order: deterministic, and a
        single over-budget query still runs alone (its volume is
        irreducible — per-query fallback would move the same rows)."""
        if not spec_items:
            return []
        cap = self.batch_rows_cap
        if cap is None:
            return [spec_items]
        dfs = ctx["dict"]["all"]

        def added_cost(term_set, have):
            return sum(int(dfs[t]["df"]) for t in term_set - have
                       if t in dfs)

        groups: list = []
        cur: list = []
        cur_terms: set = set()
        cur_cost = 0
        for qid, spec in spec_items:
            t: set = set()
            self._spec_terms(spec, t)
            add = added_cost(t, cur_terms)
            if cur and cur_cost + add > cap:
                groups.append(cur)
                cur, cur_terms, cur_cost = [], set(), 0
                add = added_cost(t, cur_terms)
            cur.append((qid, spec))
            cur_terms |= t
            cur_cost += add
        if cur:
            groups.append(cur)
        return groups

    def suggest(self, word: str, max_edit_distance: int = 2) -> str:
        """Spelling suggestion (Q18, get_spelling_suggestion): trigram
        fragment index over the dictionary's word terms + edit-distance
        ranking; '' when the word needs no correction."""
        from .spell import suggest
        return suggest(self, word, max_edit_distance)

    def batch_suggest(self, words: list[str],
                      max_edit_distance: int = 2) -> dict[str, str]:
        """Spelling suggestions for a whole word list in one Spark job
        (the query-log-scale path, mirroring batch_search)."""
        from .spell import batch_suggest
        return batch_suggest(self, words, max_edit_distance)

    def get_eset(self, rset: list[int], maxitems: int = 20,
                 scheme: str = "trad", expand_k: float = 1.0,
                 min_wt: float = 0.0,
                 include_query_terms: bool = False,
                 query: Optional[str] = None) -> DataFrame:
        """Relevance-feedback expansion terms (Xapian ``get_eset``,
        omenquire.cc:609-654) for the relevant doc_ids ``rset`` —
        DataFrame ``(term, wt)``, weight descending.  When ``query`` is
        given and ``include_query_terms`` is False (the Xapian
        default), the query's exact terms are excluded
        (ExpandDeciderFilterTerms)."""
        from .eset import eset_df, query_exclude_terms
        exclude: list[str] = []
        if query and not include_query_terms:
            exclude = query_exclude_terms(query)
        return eset_df(self, rset, maxitems=maxitems, scheme=scheme,
                       expand_k=expand_k, min_wt=min_wt,
                       exclude_terms=exclude or None)

    def get_matching_terms(self, query: str, doc_id: int) -> DataFrame:
        """Terms of document ``doc_id`` that also occur in ``query``,
        ordered by the term's first occurrence in the query
        (Enquire::get_matching_terms, omenquire.cc:675-708: the
        termlist is intersected with the query's term map and sorted
        by ByQueryIndexCmp).  Returns (term, qindex); wildcard
        patterns contribute no terms (the Xapian query object holds
        the unexpanded pattern).  One pushed-down scan of the forward
        termlist — doc_id and the small term set both reach the
        parquet reader."""
        from .eset import _termlist, query_exclude_terms
        order: dict[str, int] = {}
        for t in query_exclude_terms(query):
            order.setdefault(t, len(order) + 1)
        if not order:
            return self.spark.createDataFrame(
                [], "term string, qindex long")
        qmap = F.create_map(*[F.lit(x) for kv in order.items()
                              for x in kv])
        return (_termlist(self)
                .filter((F.col("doc_id") == int(doc_id))
                        & F.col("term").isin(list(order)))
                .select("term", qmap[F.col("term")]
                        .cast("long").alias("qindex"))
                .orderBy("qindex"))

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
