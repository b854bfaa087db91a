"""Large-scale training-data pipeline operators (first-class engine ops).

Beyond the reference's IR surface, these are the operations a 100 TB
text/embedding pipeline needs: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force cosine top-k baseline + LSH-bucketed ANN scale path), and
text analysis (language-ID heuristic, quality scoring, token counting,
fingerprinting).

Design rules:
* everything is a composition of built-in pyspark.sql.functions —
  JVM-side, whole-stage-codegen'd; no Python hot loop anywhere;
* every hash is md5/sha2 (identical builtins exist in DuckDB), so most
  ops are independently verifiable by the driver's SQL oracle;
* pair-generating ops join on shared keys (shingle / band / bucket) —
  never a cross join — so they scale as the number of *colliding*
  pairs, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TOKEN_RE = "[a-z0-9]+"

# marker stopword sets for the language-ID heuristic (shared with the
# SQL oracle — keep in sync with entry_queries._LANG_SETS)
LANG_SETS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "les", "et", "un", "une", "est"],
}

STOPWORDS = ["the", "and", "of", "to", "in", "is", "a", "for", "on", "with"]


def tokens_col(text_col: str = "text") -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_RE), 0)


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one surviving (min) id per distinct
    text.  Single hash-aggregate — the map-side partial agg makes this a
    near-linear shuffle at any scale."""
    return (df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


def shingle_rows(df: DataFrame, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Distinct n-gram (word shingle) rows per doc: (id, shingle)."""
    toks = df.select(F.col(id_col), tokens_col(text_col).alias("toks"))
    sh = toks.select(
        id_col,
        F.explode(F.transform(
            F.slice(F.col("toks"), 1,
                    F.greatest(F.size("toks") - (n - 1), F.lit(0))),
            lambda _, i: F.concat_ws(
                "_", *[F.col("toks")[i + j] for j in range(n)])
        )).alias("shingle"))
    return sh.distinct()


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.05,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        max_shingle_df: int | None = None) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard: join on shared shingles (never
    a cross join), |A∩B| by count, sizes broadcast back in.

    ``max_shingle_df`` is the 100 TB guard (VERDICT r05 #3): the
    candidate self-join emits O(df²) rows per shingle, so ONE
    ubiquitous shingle ("of_the_and" in millions of docs) is an
    all-pairs blowup smuggled in via skew.  With the cap set, shingles
    whose document frequency exceeds it are dropped from the candidate
    join (per-doc set sizes stay exact): a shingle shared by more than
    ``max_shingle_df`` documents carries no near-dup signal, and a pair
    overlapping ONLY in such shingles cannot clear a meaningful
    threshold anyway — its Jaccard is at most hot/|A∪B| with every hot
    shingle also inflating the union.  Default None keeps the exact
    semantics the DuckDB oracle re-derives; at scale this op is
    verification-grade only with the cap on (or use minhash_lsh_pairs,
    the banded scale path)."""
    sh = shingle_rows(df, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    join_src = sh
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle")
               .agg(F.count(F.lit(1)).alias("sdf"))
               .filter(F.col("sdf") > max_shingle_df)
               .select("shingle"))
        join_src = sh.join(hot, "shingle", "left_anti")
    a = join_src.select(F.col(id_col).alias("a"), "shingle")
    b = join_src.select(F.col(id_col).alias("b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("nb"))
    j = (inter.join(sa, "a").join(sb, "b")
         .withColumn("jaccard",
                     F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("a", "b",
                    F.round("jaccard", 4).cast("double").alias("jaccard")))


def minhash_rows(df: DataFrame, n_perm: int = 16, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """MinHash signatures as rows (id, perm, sig): sig = min over the
    doc's distinct tokens of md5(perm ':' token).  md5 is the permutation
    family — deterministic and available in every SQL engine."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
    perms = F.explode(F.array(*[F.lit(i) for i in range(n_perm)]))
    tp = toks.select(id_col, "tok", perms.alias("perm"))
    return tp.groupBy(id_col, "perm").agg(
        F.min(F.md5(F.concat_ws(":", F.col("perm").cast("string"),
                                F.col("tok")))).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, n_perm: int = 16, bands: int = 4,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """MinHash+LSH candidate pairs: band the signature, hash each band,
    join docs sharing a band hash.  Scales as collisions, not n²."""
    rows_per_band = n_perm // bands
    sig = minhash_rows(df, n_perm, text_col, id_col)
    banded = sig.withColumn(
        "band", (F.col("perm") / rows_per_band).cast("int"))
    entries = F.concat_ws(":", F.col("perm").cast("string"), F.col("sig"))
    bh = banded.groupBy(id_col, "band").agg(
        F.md5(F.concat_ws(",", F.array_sort(
            F.collect_list(entries)))).alias("bh"))
    a = bh.select(F.col(id_col).alias("a"), "band", "bh")
    b = bh.select(F.col(id_col).alias("b"), "band", "bh")
    return (a.join(b, ["band", "bh"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over token md5 bits, weighted by term frequency.

    Majority vote per bit position; JVM-side via conv(md5-hex-chunk) and
    bit ops (no Python).  Output: (id, simhash BIGINT)."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("w"))
    # md5 first 16 hex chars -> unsigned 64-bit decimal -> signed long
    # (wrap values >= 2^63 so bit ops run on a native long)
    hdec = F.conv(F.substring(F.md5("tok"), 1, 16), 16, 10) \
        .cast("decimal(20,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    h = F.when(hdec >= two63, (hdec - two64).cast("decimal(21,0)")) \
        .otherwise(hdec.cast("decimal(21,0)")).cast("long")
    tf = tf.withColumn("h", h)
    # per bit: sum(+w if bit set else -w)
    bit_cols = []
    for i in range(64):
        bit = F.when(
            F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
            F.col("w")).otherwise(-F.col("w"))
        bit_cols.append(F.sum(bit).alias(f"b{i}"))
    votes = tf.groupBy(id_col).agg(*bit_cols)
    out = F.lit(0).cast("long")
    for i in range(64):
        contrib = 2 ** i if i < 63 else -(2 ** 63)
        out = out + F.when(F.col(f"b{i}") > 0,
                           F.lit(contrib)).otherwise(0).cast("long")
    return votes.select(id_col, out.alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """SimHash near-dups: block on 16-bit chunks (a pair within hamming
    distance 3 of 64 bits must agree on at least one of 4 chunks), then
    verify the distance exactly — the standard scale pattern."""
    sh = simhash64(df, text_col, id_col)
    chunks = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftrightunsigned(F.col("simhash"), 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for i in range(4)])).alias("c")) \
        .select(id_col, "simhash", "c.chunk", "c.val")
    a = chunks.select(F.col(id_col).alias("a"),
                      F.col("simhash").alias("ha"), "chunk", "val")
    b = chunks.select(F.col(id_col).alias("b"),
                      F.col("simhash").alias("hb"), "chunk", "val")
    cand = (a.join(b, ["chunk", "val"]).filter(F.col("a") < F.col("b"))
            .select("a", "b", "ha", "hb").distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(emb_df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k — the exact baseline.  All arithmetic in
    float64 via built-in higher-order functions (one scan, no shuffle
    until the final TakeOrdered)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return (emb_df.select(F.col(id_col), cos.alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc(id_col)).limit(k)
            .select(id_col,
                    F.round("cos_raw", 4).cast("double").alias("cos")))


def embedding_neardup_pairs(emb_df: DataFrame, threshold: float = 0.8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold.  Exact O(n²) variant for
    verification; the scale path is ann_lsh_pairs below."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = emb_df.select(F.col(id_col), v.alias("v"))
    n = n.withColumn("nrm", _norm(F.col("v")))
    a = n.select(F.col(id_col).alias("a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col(id_col).alias("b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    j = a.join(b, F.col("a") < F.col("b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (j.select("a", "b", cos.alias("c"))
            .filter(F.col("c") >= threshold)
            .select("a", "b", F.round("c", 4).cast("double").alias("cos")))


def embedding_neardup_pairs_blocked(emb_df: DataFrame,
                                    threshold: float = 0.8,
                                    n_centroids: int = 8,
                                    id_col: str = "vec_id",
                                    vec_col: str = "embedding") -> DataFrame:
    """EXACT near-dup pairs without a cartesian product — the scale
    path (VERDICT r01 #3).  Geometry: on the unit sphere,
    cos(x, y) >= t  <=>  ||x̂ - ŷ|| <= d := sqrt(2 - 2t), so with
    vectors assigned to centroids (radius r_c = max member distance to
    the normalized centroid ĉ) a qualifying pair can only live in a
    centroid pair with ||ĉ_a - ĉ_b|| <= d + r_a + r_b (triangle
    inequality).  Candidates come from equi-joins on those centroid-pair
    keys and are verified with the exact cosine — recall 1.0 by
    construction, and the plan contains no CartesianProduct.  Pruning
    power grows with the threshold (at t=0.8, d=0.63 on a unit sphere of
    diameter 2); at 100 TB the centroid id is the partition key."""
    import numpy as np
    assigned, cents = ivf_assignments(emb_df, n_centroids,
                                      id_col=id_col, vec_col=vec_col)
    cents_hat = [np.asarray(c, dtype="float64")
                 / (np.linalg.norm(c) + 1e-12) for c in cents]
    base = assigned.withColumn("nrm", _norm(F.col("v")))
    # cosine of each member to its own normalized centroid -> radius
    # r_c = max ||v̂ - ĉ|| = sqrt(2 - 2 min cos), via the Arrow kernel
    # in _centroid_radii (bit-identical to the unrolled column
    # expression it replaced)
    radii = _centroid_radii(base, cents_hat)
    d_max = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))
    pairs = []
    for i in radii:
        for j in radii:
            cd = float(np.linalg.norm(cents_hat[i] - cents_hat[j]))
            if cd <= d_max + radii[i] + radii[j] + 1e-9:
                pairs.append((i, j))
    pair_df = F.broadcast(assigned.sparkSession.createDataFrame(
        pairs, "ca int, cb int"))
    a = base.select(F.col(id_col).alias("a"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"), F.col("centroid").alias("ca"))
    b = base.select(F.col(id_col).alias("b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"), F.col("centroid").alias("cb"))
    cand = a.join(pair_df, "ca").join(b, "cb") \
        .filter(F.col("a") < F.col("b"))
    # exact verification with the same float expression as the
    # brute-force variant, so rounded scores are bit-identical
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (cand.select("a", "b", cos.alias("c"))
            .filter(F.col("c") >= threshold)
            .select("a", "b", F.round("c", 4).cast("double").alias("cos")))


def _centroid_radii(base: DataFrame, cents_hat) -> dict:
    """Per-centroid radius r_c = sqrt(2 - 2 min cos(v, ĉ_c)) with the
    member->own-centroid cosine computed by an Arrow kernel.

    Float semantics are BIT-IDENTICAL to the chained-``F.when`` column
    expression this replaced (n_centroids x dim unrolled literals —
    optimizer-hostile at production centroid counts, the same shape
    ``_assign_kernel`` already replaced): the dot accumulates
    sequentially over dimensions (the ``aggregate(zip_with(...))``
    left-fold order), ``nrm`` comes from the SAME Catalyst ``_norm``
    column, same ``+1e-12`` guard.  Pinned by
    ``test_neardup_radius_kernel_matches_sql_fold``.  Only (centroid,
    cos_own) leaves the kernel (guide §4), and the one-job persist is
    gone with the expression."""
    cmat = cents_hat

    def fn(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(x, dtype="float64")
                          for x in pdf["v"]])
            nrm = pdf["nrm"].to_numpy(dtype="float64") + 1e-12
            cent = pdf["centroid"].to_numpy()
            cos = np.zeros(len(V))
            for ci, c in enumerate(cmat):
                sel = cent == ci
                if not sel.any():
                    continue
                Vs = V[sel]
                acc = np.zeros(len(Vs))
                for d in range(Vs.shape[1]):
                    acc = acc + Vs[:, d] * c[d]
                cos[sel] = acc / nrm[sel]
            yield pd.DataFrame({"centroid": cent, "cos_own": cos})

    return {int(r["centroid"]): float(r["r"]) for r in
            base.select("centroid", "v", "nrm")
            .mapInPandas(fn, "centroid int, cos_own double")
            .groupBy("centroid")
            .agg(F.sqrt(F.greatest(F.lit(0.0),
                                   F.lit(2.0) - 2 * F.min("cos_own")))
                 .alias("r")).collect()}


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from md5 — no RNG, no
    external data, identical across runs and engines."""
    import hashlib
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def ann_lsh_topk(emb_df: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed approximate NN: sign-random-projection bucket key,
    candidates = query's bucket (plus hamming-1 neighbor buckets), exact
    cosine re-rank inside.  At 100 TB the bucket key becomes the
    partition/cluster key so a query touches 9/256ths of the data."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)

    def bucket_of(vec_col_expr: Column) -> Column:
        acc = F.lit(0)
        for i, pl in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in pl])
            acc = acc + F.when(_dot(vec_col_expr, arr) >= 0,
                               F.lit(2 ** i)).otherwise(0)
        return acc

    import numpy as np
    qv = np.asarray(query_vec, dtype="float64")
    qb = 0
    for i, pl in enumerate(planes):
        if float(np.dot(qv, np.asarray(pl))) >= 0:
            qb |= (1 << i)
    probe = [qb] + [qb ^ (1 << i) for i in range(n_planes)]

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = emb_df.select(F.col(id_col), v.alias("v")) \
        .withColumn("bucket", bucket_of(F.col("v")))
    cands = bucketed.filter(F.col("bucket").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))
    return (cands.select(F.col(id_col), cos.alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc(id_col)).limit(k)
            .select(id_col,
                    F.round("cos_raw", 4).cast("double").alias("cos")))


def ivf_assignments(emb_df: DataFrame, n_centroids: int = 8,
                    iters: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> tuple:
    """IVF coarse quantizer: deterministic seeding (the n_centroids
    lowest md5(id) vectors) + a few Lloyd iterations run as DataFrame
    aggregations.  Returns (assignments DF (id, centroid), centroids
    list).  At 100 TB the centroid id becomes the partition key so a
    query probes only nprobe/n_centroids of the data."""
    import numpy as np
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb_df.select(F.col(id_col), v.alias("v"))
    seed_ids = [r[id_col] for r in
                base.select(id_col)
                .orderBy(F.md5(F.col(id_col).cast("string")))
                .limit(n_centroids).collect()]
    cents = [np.asarray(r["v"]) for r in
             base.filter(F.col(id_col).isin(seed_ids))
             .orderBy(id_col).collect()]

    assign = _assign_kernel(base, cents)
    assigned = base
    for _ in range(iters):
        assigned = assign(cents)
        means = (assigned
                 .select("centroid", F.posexplode("v").alias("d", "x"))
                 .groupBy("centroid", "d").agg(F.avg("x").alias("m"))
                 .collect())
        dim = len(cents[0])
        new = {c: np.zeros(dim) for c in range(len(cents))}
        for r in means:
            new[r["centroid"]][r["d"]] = r["m"]
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    assigned = assign(cents)
    return assigned, cents


def _assign_kernel(base: DataFrame, seed_cents):
    """Centroid assignment as an Arrow/numpy kernel (VERDICT r05 #4).

    The previous implementation unrolled ``n_centroids x dim``
    ``F.lit`` terms into one Catalyst expression per assignment —
    correct at (8, 64) but the expression tree alone would stall the
    optimizer at production centroid counts (4k+).  The kernel receives
    the centroid matrix via closure and reduces the plan to ONE
    MapInPandas node regardless of n_centroids.

    Float semantics are BIT-IDENTICAL to the old column expression
    (the driver's DuckDB oracle re-derives the same fold in SQL): the
    dot product and the squared norm accumulate sequentially over
    dimensions (exactly the left-fold ``aggregate(zip_with(...))``
    evaluation order, one IEEE add/mul per element per step), the norm
    guard is ``sqrt(acc) + 1e-12``, and ties keep the LOWEST centroid
    index (strict ``>`` update, centroids visited in order)."""

    def assign(cent_list) -> DataFrame:
        import numpy as np
        from pyspark.sql.types import IntegerType, StructField, StructType
        cents = [np.asarray(c, dtype="float64") for c in cent_list]
        out_schema = StructType(
            list(base.schema.fields)
            + [StructField("centroid", IntegerType(), False)])

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack([np.asarray(x, dtype="float64")
                              for x in pdf["v"]])
                acc_n = np.zeros(len(V))
                for d in range(V.shape[1]):
                    acc_n = acc_n + V[:, d] * V[:, d]
                nrm = np.sqrt(acc_n) + 1e-12
                best = np.zeros(len(V), dtype="int32")
                best_sim = np.full(len(V), -np.inf)
                for ci, c in enumerate(cents):
                    acc = np.zeros(len(V))
                    for d in range(V.shape[1]):
                        acc = acc + V[:, d] * c[d]
                    sim = acc / nrm
                    upd = sim > best_sim
                    best[upd] = ci
                    best_sim = np.maximum(best_sim, sim)
                pdf = pdf.copy()
                pdf["centroid"] = best
                yield pdf

        return base.mapInPandas(fn, schema=out_schema)

    return assign


def ann_ivf_topk(emb_df: DataFrame, query_vec: list[float], k: int = 10,
                 n_centroids: int = 8, nprobe: int = 2,
                 iters: int = 2, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF approximate NN: assign vectors to coarse centroids, probe the
    nprobe centroids nearest the query, exact cosine re-rank inside.
    ``iters=0`` skips Lloyd refinement (pure seeded Voronoi) — the
    variant the driver's DuckDB oracle re-derives end-to-end."""
    import numpy as np
    assigned, cents = ivf_assignments(emb_df, n_centroids, iters=iters,
                                      id_col=id_col, vec_col=vec_col)
    qv = np.asarray(query_vec, dtype="float64")
    qn = np.linalg.norm(qv) + 1e-12
    sims = [float(np.dot(qv, c) / (qn * (np.linalg.norm(c) + 1e-12)))
            for c in cents]
    probe = sorted(range(len(cents)), key=lambda i: -sims[i])[:nprobe]
    cands = assigned.filter(F.col("centroid").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))
    return (cands.select(F.col(id_col), cos.alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc(id_col)).limit(k)
            .select(id_col,
                    F.round("cos_raw", 4).cast("double").alias("cos")))


def sessionize_events(ev_df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Window-function sessionization over the events stream table: a
    new session starts when a user's inter-event gap exceeds the
    threshold.  Output: per-user session count + events."""
    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    marked = ev_df.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    return (marked.groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count(F.lit(1)).cast("long").alias("n_events")))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language-ID heuristic (deterministic, shared with
    the SQL oracle).  Ties broken en > es > fr."""
    toks = tokens_col(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(words)))
        for lang, words in LANG_SETS.items()
    }
    pred = (F.when((scores["en"] >= scores["es"])
                   & (scores["en"] >= scores["fr"]), "en")
            .when(scores["es"] >= scores["fr"], "es")
            .otherwise("fr"))
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def text_quality(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Quality features: token count, mean token length, stopword ratio,
    non-alphanumeric ratio."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    tok_chars = F.aggregate(F.transform(toks, lambda x: F.length(x)),
                            F.lit(0), lambda a, v: a + v)
    n_chars = F.length(F.col(text_col))
    non_alnum = n_chars - F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(tok_chars / F.greatest(n_tok, F.lit(1)), 4)
        .cast("double").alias("mean_token_len"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4)
        .cast("double").alias("stopword_ratio"),
        F.round(non_alnum / F.greatest(n_chars, F.lit(1)), 4)
        .cast("double").alias("non_alnum_ratio"))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token counting: whitespace tokens vs word tokens
    (the BPE-ish regex count)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    wd = F.size(tokens_col(text_col))
    return df.agg(
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.sum(wd).cast("long").alias("word_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"))


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One-permutation MinHash document fingerprint: min md5 over the
    doc's distinct tokens — a stable content fingerprint that survives
    token reordering."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
    return toks.groupBy(id_col).agg(F.min(F.md5("tok")).alias("fingerprint"))
