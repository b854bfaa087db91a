"""Datapipe + multimodal operator tests (Spark), including plan-shape
assertions (broadcast where expected, no cross joins in pair ops)."""

import hashlib

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (1, "the quick brown fox jumps over the lazy cat", "en", "s0"),
        (2, "completely different content here now", "en", "s1"),
        (3, "the quick brown fox jumps over the lazy dog", "en", "s1"),
        (4, "el gato y el perro de la casa que", "es", "s2"),
        (5, "le chat et les chiens est un animal", "fr", "s2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_exact_dedup(spark, docs):
    from mdq_spark.datapipe import exact_dedup
    out = exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id[0] == 2          # docs 0 and 3 identical, keeper = 0
    assert 3 not in by_id
    assert len(out) == 5


def test_ngram_jaccard(spark, docs):
    from mdq_spark.datapipe import ngram_jaccard_pairs
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert out[(0, 3)] == 1.0      # identical docs
    assert (0, 1) in out           # near-dup (one word differs)
    assert (0, 2) not in out


def test_minhash_lsh_finds_exact_dups(spark, docs):
    from mdq_spark.datapipe import minhash_lsh_pairs
    pairs = {(r["a"], r["b"])
             for r in minhash_lsh_pairs(docs, n_perm=16, bands=4).collect()}
    assert (0, 3) in pairs         # identical docs always collide
    assert (2, 4) not in pairs


def test_simhash_similar_docs_close(spark, docs):
    from mdq_spark.datapipe import simhash64, simhash_neardup_pairs
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[0] == sh[3]          # identical text -> identical simhash
    ham03 = bin(sh[0] ^ sh[1]).count("1")
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    assert ham03 < ham02           # near-dup closer than unrelated
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_neardup_pairs(docs, max_hamming=0).collect()}
    assert pairs[(0, 3)] == 0


def test_lang_id(spark, docs):
    from mdq_spark.datapipe import lang_id
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert out[0] == "en" and out[4] == "es" and out[5] == "fr"


def test_text_quality(spark, docs):
    from mdq_spark.datapipe import text_quality
    out = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[0]["stopword_ratio"] == pytest.approx(2 / 9, abs=1e-4)


def test_cosine_topk_exact(spark):
    from mdq_spark.datapipe import cosine_topk
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df, [1.0, 0.1, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in out] == [0, 1]
    assert out[0]["cos"] == pytest.approx(1 / (1.01 ** 0.5), abs=1e-3)


def test_ann_lsh_contains_true_nn(spark):
    from mdq_spark.datapipe import ann_lsh_topk, cosine_topk
    import math
    rows = [(i, [math.sin(i * 0.7 + j) for j in range(8)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [math.sin(5 * 0.7 + j) for j in range(8)]  # == vec 5's vector
    exact = cosine_topk(df, q, k=1).collect()
    approx = ann_lsh_topk(df, q, k=5).collect()
    assert exact[0]["vec_id"] in {r["vec_id"] for r in approx}


def test_pair_ops_have_no_cartesian(spark, docs):
    import math
    from mdq_spark.datapipe import (
        embedding_neardup_pairs_blocked, minhash_lsh_pairs,
        ngram_jaccard_pairs)
    rows = [(i, [math.sin(i * 0.31 + j) for j in range(8)])
            for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for df in (minhash_lsh_pairs(docs), ngram_jaccard_pairs(docs),
               embedding_neardup_pairs_blocked(emb, threshold=0.8,
                                               n_centroids=4)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_blocked_neardup_equals_bruteforce(spark):
    """The centroid-blocked exact pair search must return the same
    pairs+scores as the O(n²) variant (recall 1.0 by construction)."""
    import math
    from mdq_spark.datapipe import (
        embedding_neardup_pairs, embedding_neardup_pairs_blocked)
    rows = [(i, [math.sin(i * 0.13 + 0.9 * j) for j in range(8)])
            for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for thr in (0.3, 0.8, 0.95):
        brute = {(r["a"], r["b"]): r["cos"] for r in
                 embedding_neardup_pairs(emb, threshold=thr).collect()}
        blocked = {(r["a"], r["b"]): r["cos"] for r in
                   embedding_neardup_pairs_blocked(
                       emb, threshold=thr, n_centroids=5).collect()}
        assert blocked == brute
        assert brute  # non-degenerate fixture


# --- multimodal plumbing -----------------------------------------------------

def test_multimodal_features(spark):
    from mdq_spark.multimodal import (
        extract_features, fake_decode, synthetic_media)
    media = synthetic_media(spark, n=12)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    payload = (hashlib.sha256(b"media-0").hexdigest() * 4).encode()
    assert list(by_id[0]["feature"]) == pytest.approx(
        fake_decode(payload, 8), abs=1e-6)
    assert by_id[0]["payload_sha"] == hashlib.sha256(payload).hexdigest()


def test_multimodal_real_decoder_is_stubbed():
    from mdq_spark.multimodal import decode_image
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    from mdq_spark.multimodal import frame_sample_plan, synthetic_media
    media = synthetic_media(spark, n=9)
    frames = frame_sample_plan(media, every_ms=5000).collect()
    # 3 videos (every 3rd), 15000ms -> ts 0/5000/10000
    vids = {r["media_id"] for r in frames}
    assert all(r["frame_ts_ms"] in (0, 5000, 10000) for r in frames)
    assert len(frames) == len(vids) * 3


def test_resize_metadata(spark):
    from mdq_spark.multimodal import resize_metadata, synthetic_media
    media = synthetic_media(spark, n=6)
    out = resize_metadata(media, max_side=256).collect()
    for r in out:
        assert r["target_w"] == 256 and r["target_h"] == 192


def test_ivf_contains_true_nn(spark):
    from mdq_spark.datapipe import ann_ivf_topk, cosine_topk
    import math
    rows = [(i, [math.sin(i * 0.7 + j) for j in range(8)])
            for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [math.sin(9 * 0.7 + j) for j in range(8)]
    exact = cosine_topk(df, q, k=1).collect()
    approx = ann_ivf_topk(df, q, k=5, n_centroids=4, nprobe=2).collect()
    assert exact[0]["vec_id"] in {r["vec_id"] for r in approx}


def test_sessionize(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base), (1, base + dt.timedelta(minutes=5)),
        (1, base + dt.timedelta(hours=2)),     # new session
        (2, base), (2, base + dt.timedelta(minutes=31)),  # new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from mdq_spark.datapipe import sessionize_events
    out = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in sessionize_events(df).collect()}
    assert out[1] == (2, 3)
    assert out[2] == (2, 2)


def test_ngram_jaccard_hot_shingle_cap(spark):
    """VERDICT r05 #3: max_shingle_df bounds the candidate self-join.
    A shingle present in every doc would emit O(n_docs^2) join rows;
    with the cap it is dropped from candidate generation (per-doc
    sizes stay exact) while pairs sharing any informative shingle are
    still found with the same rounded score."""
    from mdq_spark.datapipe import ngram_jaccard_pairs, shingle_rows

    # 40 docs that all share one ubiquitous leading trigram; docs 0/1
    # are real near-dups beyond it
    rows = [(0, "common prefix here the quick brown fox jumps high"),
            (1, "common prefix here the quick brown fox leaps high")]
    rows += [(i, f"common prefix here unique{i} text{i} body{i} word{i}")
             for i in range(2, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # candidate-volume bound: the capped join source holds no shingle
    # with df > cap, so the worst-case join fan-out is cap^2 per
    # shingle, not n_docs^2
    sh = shingle_rows(df, 3)
    hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
           .filter(F.col("sdf") > 8).select("shingle"))
    pruned = sh.join(hot, "shingle", "left_anti")
    max_df = (pruned.groupBy("shingle").count()
              .agg(F.max("count")).collect()[0][0])
    assert max_df <= 8
    n_cand_uncapped = (sh.alias("x").join(sh.alias("y"), "shingle")
                       .filter(F.col("x.doc_id") < F.col("y.doc_id"))
                       .count())
    n_cand_capped = (pruned.alias("x").join(pruned.alias("y"), "shingle")
                     .filter(F.col("x.doc_id") < F.col("y.doc_id"))
                     .count())
    assert n_cand_uncapped >= 40 * 39 / 2   # the blowup is real
    assert n_cand_capped < n_cand_uncapped / 10

    capped = {(r["a"], r["b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(
                  df, threshold=0.3, max_shingle_df=8).collect()}
    assert (0, 1) in capped          # true near-dup survives the cap
    assert all(a == 0 and b == 1 for a, b in capped)
    # default (cap off) keeps the exact oracle semantics
    exact = {(r["a"], r["b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df, threshold=0.3).collect()}
    assert (0, 1) in exact


def test_ivf_assign_kernel_matches_sql_fold(spark):
    """VERDICT r05 #4: the Arrow assignment kernel must be
    BIT-IDENTICAL to the unrolled Catalyst fold it replaced (the
    DuckDB oracle re-derives that fold in SQL): same sequential
    accumulation order, same norm guard, same strict-> tie rule."""
    import numpy as np
    from mdq_spark.datapipe import _assign_kernel, _dot, _norm

    rows = [(i, [((i * 31 + d * 7) % 13) / 7.0 - 0.9
                 for d in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [np.asarray([((c * 17 + d * 3) % 11) / 5.0 - 1.0
                         for d in range(16)]) for c in range(6)]

    got = {r["vec_id"]: r["centroid"]
           for r in _assign_kernel(emb, cents)(cents).collect()}

    # the pre-r6 unrolled expression, reconstructed verbatim
    best = F.lit(0)
    best_sim = F.lit(float("-inf"))
    for ci, c in enumerate(cents):
        arr = F.array(*[F.lit(float(x)) for x in c])
        sim = _dot(F.col("v"), arr) / (_norm(F.col("v")) + F.lit(1e-12))
        best = F.when(sim > best_sim, F.lit(ci)).otherwise(best)
        best_sim = F.greatest(best_sim, sim)
    want = {r["vec_id"]: r["c"]
            for r in emb.select("vec_id", best.alias("c")).collect()}
    assert got == want


def test_ivf_kernel_scales_to_many_centroids(spark):
    """256 centroids x 64 dims must plan and run in seconds — the
    unrolled-literal plan this replaced would inflate Catalyst with
    16k literal terms per assignment."""
    import time
    import numpy as np
    from mdq_spark.datapipe import _assign_kernel

    rows = [(i, [float((i + d) % 7) for d in range(64)])
            for i in range(500)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [np.asarray([float((c * 3 + d) % 5) for d in range(64)])
             for c in range(256)]
    t0 = time.time()
    out = _assign_kernel(emb, cents)(cents)
    n = out.groupBy("centroid").count().count()
    elapsed = time.time() - t0
    assert n >= 1
    assert elapsed < 30, elapsed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


def test_neardup_radius_kernel_matches_sql_fold(spark):
    """Round-6 §10.2: the Arrow radius kernel in _centroid_radii must be
    BIT-IDENTICAL to the chained-F.when unrolled Catalyst expression it
    replaced — same sequential dot accumulation, same Catalyst nrm
    column, same +1e-12 guard, so the blocked near-dup candidate set
    (and the gate entry's hash) cannot move."""
    import numpy as np
    from mdq_spark.datapipe import _centroid_radii, _dot, _norm

    rows = [(i, [((i * 29 + d * 5) % 17) / 8.0 - 1.0
                 for d in range(16)], int(i % 5)) for i in range(300)]
    base = spark.createDataFrame(
        rows, "vec_id long, v array<double>, centroid int") \
        .withColumn("nrm", _norm(F.col("v")))
    cents_hat = [np.asarray([((c * 13 + d * 7) % 9) / 4.0 - 1.0
                             for d in range(16)]) for c in range(5)]
    cents_hat = [c / (np.linalg.norm(c) + 1e-12) for c in cents_hat]

    got = _centroid_radii(base, cents_hat)

    # the pre-change chained-when expression, reconstructed verbatim
    cos_own = None
    for ci, ch in enumerate(cents_hat):
        arr = F.array(*[F.lit(float(x)) for x in ch])
        d = _dot(F.col("v"), arr) / (F.col("nrm") + F.lit(1e-12))
        cos_own = F.when(F.col("centroid") == ci, d) if cos_own is None \
            else cos_own.when(F.col("centroid") == ci, d)
    want = {int(r["centroid"]): float(r["r"]) for r in
            base.withColumn("cos_own", cos_own)
            .groupBy("centroid")
            .agg(F.sqrt(F.greatest(F.lit(0.0),
                                   F.lit(2.0) - 2 * F.min("cos_own")))
                 .alias("r")).collect()}
    assert got == want  # exact float equality, not approx
