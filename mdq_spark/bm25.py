"""Xapian-BM25 scoring math, bit-faithful (SURVEY.md §2.7).

Ported formula-for-formula from the weight implementation the reference
links statically: ``xapian-core-1.4.17/weight/bm25weight.cc`` (bundled
tarball under ``/root/reference/``), with the defaults the reference uses
(plain ``Enquire`` -> ``new BM25Weight`` at omenquire.cc:565-567):
k1=1, k2=0, k3=1, b=0.5, min_normlen=0.5 (include/xapian/weight.h:585-597).

Gotchas preserved exactly:

* the ``tw < 2  ->  tw = tw*0.5 + 1`` floor (bm25weight.cc:106 — the
  live ``#else`` branch);
* the ``(k1 + 1)`` factor applied to every termweight (bm25weight.cc:113);
* ``normlen = max(doclen / avg_doclen, min_normlen)`` with the 0.5 clamp
  (bm25weight.cc:122-126, 163-168);
* k2 == 0 means sumextra == 0 (bm25weight.cc:212-218), so a document's
  score is exactly the sum of per-term sumparts.

Everything here is plain floats / numpy so the same code runs in the
pure-Python oracle and inside Arrow-batched Spark kernels.
"""

from __future__ import annotations

import math

K1 = 1.0
K2 = 0.0
K3 = 1.0
B = 0.5
MIN_NORMLEN = 0.5
DBL_EPSILON = 2.220446049250313e-16  # C DBL_EPSILON (percent cutoff slack)


def termweight(N: int, df: int, wqf: int = 1,
               k1: float = K1, k3: float = K3) -> float:
    """Per-term query weight (BM25Weight::init, bm25weight.cc:46-128)."""
    if df <= 0:
        return 0.0
    tw = (N - df + 0.5) / (df + 0.5)
    if tw < 2.0:
        tw = tw * 0.5 + 1.0
    w = math.log(tw)
    if k3 != 0:
        w *= (k3 + 1.0) * wqf / (k3 + wqf)
    w *= (k1 + 1.0)
    return w


def len_factor(avg_doclen: float) -> float:
    """1/avg_doclen, or 0 for an empty collection (bm25weight.cc:123-128)."""
    return 1.0 / avg_doclen if avg_doclen else 0.0


def sumpart(tw: float, wdf, doclen, lf: float,
            k1: float = K1, b: float = B,
            min_normlen: float = MIN_NORMLEN):
    """Per-(term, doc) score contribution (BM25Weight::get_sumpart,
    bm25weight.cc:163-174).  Vectorizes: ``wdf``/``doclen`` may be numpy
    arrays."""
    try:
        import numpy as np
        normlen = np.maximum(doclen * lf, min_normlen)
        return tw * (wdf / (k1 * (normlen * b + (1.0 - b)) + wdf))
    except ImportError:  # pragma: no cover
        normlen = max(doclen * lf, min_normlen)
        return tw * (wdf / (k1 * (normlen * b + (1.0 - b)) + wdf))


def maxpart(tw: float, wdf_max: int, doclen_lower_bound: int,
            lf: float, k1: float = K1, b: float = B,
            min_normlen: float = MIN_NORMLEN) -> float:
    """Per-term score upper bound (BM25Weight::get_maxpart,
    bm25weight.cc:176-201, after Macdonald et al. TOIS 2011).  Used for
    block-max pruning: evaluate at doclen = max(wdf_max, doclen_lb)."""
    denom = k1
    if k1 != 0.0 and b != 0.0:
        normlen_lb = max(max(wdf_max, doclen_lower_bound) * lf, min_normlen)
        denom *= normlen_lb * b + (1.0 - b)
    denom += wdf_max
    if denom <= 0:
        return 0.0
    return tw * (wdf_max / denom)
