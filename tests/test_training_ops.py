"""Dedup / similarity-search / text-analysis operators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators import dedup, simsearch, text


def _corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    exact = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    near = docs.filter("doc_id % 5 = 0").select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.expr("concat(text, ' extra tail words appended')").alias("text"))
    return docs.unionByName(exact).unionByName(near)


def test_dedup_exact(spark):
    c = _corpus(spark)
    groups = dedup.dedup_exact(c)
    n_exact = c.filter("doc_id >= 100000 and doc_id < 200000").count()
    assert groups.filter("n_copies = 2").count() == n_exact
    # member→canonical mapping points each injected copy at the original
    pairs = dedup.dedup_exact_pairs(c)
    assert pairs.filter("member_id - canonical_id = 100000").count() == n_exact
    assert pairs.count() == n_exact


def test_dedup_near_lsh_jaccard(spark):
    c = _corpus(spark)
    # three actions below — eager=True materializes the verify join once
    near = dedup.dedup_near(c, threshold=0.7, eager=True)
    injected = c.filter("doc_id >= 200000").count()
    caught = near.filter("id_b - id_a = 200000").count()
    assert caught >= injected * 0.9          # LSH recall on true near-dups
    # verification step keeps jaccard ∈ [0.7, 1]
    row = near.agg(F.min("jaccard"), F.max("jaccard")).collect()[0]
    assert row[0] >= 0.7 and row[1] <= 1.0


def test_simhash_near_dups_close(spark):
    c = _corpus(spark)
    sh = c.select("doc_id", dedup.simhash16("text").alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.expr("aggregate(sequence(1,16), 0, (acc,i) -> "
                 "acc + if(substring(a.s,i,1)=substring(b.s,i,1),0,1))")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 200000) \
             .select(ham.alias("ham"))
    hams = [r["ham"] for r in pairs.collect()]
    assert sum(hams) / len(hams) <= 3.0      # near-dups hash close
    assert sh.select("s").distinct().count() > 50   # but hashes do vary


def test_simhash64_numpy():
    fps = dedup.simhash64_np(["the quick brown fox jumps over the lazy dog",
                              "the quick brown fox jumps over the lazy dogs",
                              "completely different content entirely"])
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(fps[0], fps[1]) < ham(fps[0], fps[2])
    assert dedup.simhash64_np([""]) == [0]


def test_cosine_topk_planted(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(120, 32).astype(np.float32)
    noisy = base[:30] + 0.1 * rng.randn(30, 32).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(120)] + \
           [(int(1000 + i), noisy[i].tolist()) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 30").selectExpr("vec_id as query_id", "embedding")
    c = emb.selectExpr("vec_id as neighbor_id", "embedding")
    exact = simsearch.cosine_topk_brute(q, c, k=1)
    got = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert got == {(i, 1000 + i) for i in range(30)}
    approx = simsearch.cosine_topk_lsh(q, c, k=1, prefix_bits=4)
    assert simsearch.lsh_recall(exact, approx) >= 0.9


def test_text_ops(spark):
    docs = spark.createDataFrame(
        [(1, "the cat is on the mat and the dog is here"),
         (2, "der Hund und die Katze und das Haus ist hier"),
         (3, "le chat et la maison et les arbres est ici"),
         (4, "xyzzy qwerty plugh !!!! ????")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.with_langid(text.with_quality(text.with_token_counts(
               text.with_fingerprint(docs)))).collect()}
    assert out[1]["lang_guess"] == "en"
    assert out[2]["lang_guess"] == "de"
    assert out[3]["lang_guess"] == "fr"
    assert out[4]["lang_guess"] == "und"
    assert out[4]["quality"] < out[1]["quality"]     # punct-heavy → lower
    assert out[1]["n_words"] == 11
    assert out[1]["n_subword_est"] >= out[1]["n_words"]
    # fingerprint is stable and whitespace-insensitive
    docs2 = spark.createDataFrame(
        [(1, "the cat is on the   mat and the dog is here")],
        "doc_id long, text string")
    fp1 = out[1]["fingerprint"]
    fp2 = text.with_fingerprint(docs2).collect()[0]["fingerprint"]
    assert fp1 == fp2


def test_simhash64_banded_near_pairs(spark):
    c = _corpus(spark)
    pairs = dedup.simhash_near_pairs(c, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact copies (hamming 0) must all be found
    exact_pairs = {(r["doc_id"], r["doc_id"] + 100000)
                   for r in c.filter("doc_id < 100000 and doc_id % 7 = 0").collect()}
    assert exact_pairs <= got
    # hamming values are within the threshold and pigeonhole found them
    assert pairs.filter("hamming > 6").count() == 0


def test_cosine_topk_ivf_planted(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(200, 32).astype(np.float32)
    noisy = base[:40] + 0.1 * rng.randn(40, 32).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(200)] + \
           [(int(1000 + i), noisy[i].tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 40").selectExpr("vec_id as query_id", "embedding")
    c = emb.selectExpr("vec_id as neighbor_id", "embedding")
    exact = simsearch.cosine_topk_brute(q, c, k=1)
    ivf = simsearch.cosine_topk_ivf(q, c, k=1, n_centroids=8, n_probe=3)
    assert simsearch.lsh_recall(exact, ivf) >= 0.9


def test_cosine_near_dup_planted(spark):
    """Planted near-identical embeddings: LSH-prefiltered pair detection
    must find ≥90% of true pairs (recall) with zero false positives
    (exact verify) vs the brute-force oracle."""
    import numpy as np
    from p3_osm_transformer_spark.operators.simsearch import (
        cosine_near_dup_brute, cosine_near_dup_pairs)

    rng = np.random.RandomState(7)
    base = rng.randn(120, 16).astype(np.float64)
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    # plant: ids 200+i are tiny perturbations of ids i (i % 4 == 0)
    for i in range(0, 120, 4):
        pert = base[i] + rng.randn(16) * 0.01
        rows.append((200 + i, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r.id_a, r.id_b) for r in
             cosine_near_dup_brute(df, threshold=0.95).collect()}
    got = {(r.id_a, r.id_b) for r in
           cosine_near_dup_pairs(df, threshold=0.95).collect()}
    assert len(exact) >= 30                      # the planted pairs exist
    assert got <= exact                          # exact verify: no FPs
    assert len(got & exact) / len(exact) >= 0.9  # LSH recall


def test_hamming_band0_sign_flip(spark):
    """Regression: a Hamming≤3 pair whose ONLY matching band is band 0 and
    whose signs differ (bit 63 flipped) must be found — a sign-preserving
    band-0 extraction (% 65536 on a negative int64) silently drops it."""
    base = 0x1234
    flipped = base ^ (1 << 63) ^ (1 << 17) ^ (1 << 33)   # bands 1,2,3 differ
    # two's-complement int64 view (negative)
    flipped_i64 = flipped - (1 << 64) if flipped >= (1 << 63) else flipped
    df = spark.createDataFrame([(1, base), (2, flipped_i64)],
                               "id long, h long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in dedup.hamming_near_pairs(df, "id", "h", 3).collect()}
    assert got == {(1, 2, 3)}


def test_hamming_banded_equals_brute_with_negatives(spark):
    """Banded plan == O(n²) popcount oracle at hamming≤3 on a corpus where
    ~half the fingerprints are negative and flips include bit 63."""
    rows = []
    for i in range(200):
        h = ((i * 1103515245 + 12345) % (1 << 31)) * (1 << 31) + i
        if i % 2 == 1:
            h ^= 1 << 63
        rows.append((i, h - (1 << 64) if h >= (1 << 63) else h))
    for i in range(0, 200, 5):                       # planted 1-bit flips
        h = rows[i][1] ^ (1 << (i % 64))
        rows.append((1000 + i, h - (1 << 64) if h >= (1 << 63) else
                     (h + (1 << 64) if h < -(1 << 63) else h)))
    df = spark.createDataFrame(rows, "id long, h long")
    a = df.selectExpr("id as id_a", "h as h_a")
    b = df.selectExpr("id as id_b", "h as h_b")
    brute = {(r.id_a, r.id_b) for r in
             a.crossJoin(b).filter("id_a < id_b")
              .filter(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= 3)
              .collect()}
    got = {(r.id_a, r.id_b) for r in
           dedup.hamming_near_pairs(df, "id", "h", 3).collect()}
    assert brute == got and len(got) >= 40


def test_hamming_hot_bucket_cap(spark):
    """max_bucket drops degenerate hot band-buckets (bounds the m²/2 pair
    blow-up) while pairs outside the hot bucket survive."""
    rows = [(i, 42) for i in range(50)]              # 50 identical hashes
    far = (1 << 40) | (1 << 50) | (1 << 60)          # hamming 6 from 42
    rows += [(100, far), (101, far ^ 2)]             # a normal near pair
    df = spark.createDataFrame(rows, "id long, h long")
    capped = {(r.id_a, r.id_b) for r in
              dedup.hamming_near_pairs(df, "id", "h", 3,
                                       max_bucket=10).collect()}
    assert (100, 101) in capped
    assert not any(a < 50 and b < 50 for a, b in capped)
    # default cap: hot group found in full
    full = dedup.hamming_near_pairs(df, "id", "h", 3).count()
    assert full == 50 * 49 // 2 + 1


def test_prefix_bits_scale_with_corpus():
    """Bucket count must grow with corpus size (the ANN parallelism
    ceiling AND the n²/buckets candidate bound)."""
    pb = simsearch.pick_prefix_bits
    assert pb(1_000) >= 4
    assert pb(100_000) > pb(1_000)
    assert pb(100_000_000) > pb(100_000)
    assert pb(10**12) <= 24                          # occupancy-lever regime
    # derived bucket counts keep per-bucket occupancy near the target
    for n in (10**5, 10**7, 10**9):
        buckets = 2 ** pb(n)
        assert n / buckets <= 1024                   # no degenerate buckets


def test_sketch_bits_literal_matrix_matches_per_row_form(spark):
    """The literal-coefficient single-pass sketch (dim known) must be
    bit-identical to the per-row md5 fallback — same coefficients, same
    d-ascending float summation order.  Pins the q31/q44/q49 bucket
    assignments across the r3 performance rewrite."""
    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(24)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = emb.select(
        simsearch.sketch_bits("embedding", 12, dim=24).alias("fast"),
        simsearch.sketch_bits("embedding", 12, dim=None).alias("ref")).collect()
    assert all(r["fast"] == r["ref"] for r in got)
    assert len({r["fast"] for r in got}) > 10   # sketches actually vary


def test_sketch_bits_arrow_equals_catalyst_incl_edge_rows(spark):
    """The r5 Arrow sketch (vectorized pandas_udf) must be bit-identical
    to the Catalyst literal-matrix form, INCLUDING the ragged-row edge
    semantics the HOF chain defines: shorter vector → all-'0' bits,
    longer or NULL vector → empty string."""
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(24)]) for i in range(300)]
    rows += [(900, None), (901, [1.0] * 10), (902, [1.0] * 30), (903, [])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = emb.select(
        "vec_id",
        simsearch.sketch_bits("embedding", 12, dim=24, impl="arrow")
        .alias("arrow"),
        simsearch.sketch_bits("embedding", 12, dim=24, impl="catalyst")
        .alias("cat")).collect()
    bad = [(r["vec_id"], r["arrow"], r["cat"])
           for r in got if r["arrow"] != r["cat"]]
    assert not bad, bad[:5]


def test_cosine_topk_lsh_arrow_equals_catalyst_incl_edge_rows(spark):
    """The r5.3 Arrow re-rank (fused per-pair cosine pandas_udf) + long
    bucket keys must leave cosine_topk_lsh's OUTPUT identical to the
    Catalyst HOF spec twin — same (query_id, neighbor_id, cos_sim, rank)
    rows, cos_sim bit-exact before the round-6 — including the HOF edge
    semantics: NULL embedding or per-pair length mismatch → NULL cos_sim
    (ranked last), equal ragged lengths still compute exactly."""
    rng = np.random.RandomState(17)
    rows = [(i, [float(x) for x in rng.randn(24)]) for i in range(400)]
    # ragged/null corpus rows: shorter, longer, null, empty
    rows += [(900, [1.0] * 10), (901, [0.5] * 30), (902, None), (903, [])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qrows = [(5000 + i, [float(x) for x in rng.randn(24)]) for i in range(12)]
    qrows += [(5900, [1.0] * 10), (5901, None)]   # ragged/null queries too
    qv = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
    cv = emb.selectExpr("vec_id as neighbor_id", "embedding")
    a = simsearch.cosine_topk_lsh(qv, cv, k=7, prefix_bits=4, dim=24,
                                  impl="arrow")
    b = simsearch.cosine_topk_lsh(qv, cv, k=7, prefix_bits=4, dim=24,
                                  impl="catalyst")
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    fa = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in a.collect()}
    fb = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in b.collect()}
    assert fa == fb and len(fa) > 40


def test_ann_lsh_auto_bits_planted_recall(spark):
    """cosine_topk_lsh with prefix_bits=None (corpus-derived) still finds
    planted exact copies — identical vectors share a bucket at any bits."""
    import numpy as np
    rng = np.random.RandomState(3)
    base = rng.randn(300, 16).astype(np.float64)
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    rows += [(1000 + i, [float(x) for x in base[i]]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 20").selectExpr("vec_id as query_id", "embedding")
    c = emb.selectExpr("vec_id as neighbor_id", "embedding")
    out = simsearch.cosine_topk_lsh(q, c, k=1, prefix_bits=None)
    top1 = {(r.query_id, r.neighbor_id) for r in out.filter("rank = 1").collect()}
    assert top1 == {(i, 1000 + i) for i in range(20)}


def test_doc_signatures_arrow_equals_catalyst(spark):
    """The Arrow signature fast path (r5: the JVM construction burned 4×
    the CPU at 32 cores) must be VALUE-IDENTICAL to the Catalyst spec
    form — minima, 60-bit hash sets, and band keys — including the edge
    docs: <shingle_n tokens, punctuation-only (tokenizes to nothing →
    one ""-shingle), empty string, and NULL text (Catalyst's concat_ws
    turns the null token array into "" — the row is KEPT)."""
    edge = spark.createDataFrame(
        [(900001, "two tokens"), (900002, "one"), (900003, "!!! ... ---"),
         (900004, ""), (900005, None),
         (900006, "Mixed CASE text with   runs\tof whitespace and 42 digits")],
        "doc_id long, text string")
    c = _corpus(spark).unionByName(edge)
    a = dedup._doc_signatures(c, "doc_id", "text", 8, 2, 3, impl="arrow")
    b = dedup._doc_signatures(c, "doc_id", "text", 8, 2, 3, impl="catalyst")
    fa = {r["doc_id"]: (sorted(r["hset"]), list(r["bands"]))
          for r in a.collect()}
    fb = {r["doc_id"]: (sorted(r["hset"]), list(r["bands"]))
          for r in b.collect()}
    assert fa == fb
    assert 900005 in fa and 900004 in fa


def test_dedup_near_arrow_verify_equals_catalyst(spark):
    """The r5 flat-batch numpy Jaccard verify (the boxed
    array_intersect/array_union form burned 7-16× the CPU at 32 cores —
    see _jaccard_arrow) and the r5 long band keys must leave
    dedup_near's OUTPUT identical to the Catalyst spec twins: same
    pairs, bit-identical jaccard values, across the edge docs (empty /
    NULL / punctuation-only text, sub-shingle token counts) and the
    injected exact + near duplicates."""
    edge = spark.createDataFrame(
        [(900001, "two tokens"), (900002, "one"), (900003, "!!! ... ---"),
         (900004, ""), (900005, None), (900011, "two tokens"),
         (900012, ""), (900013, None)],
        "doc_id long, text string")
    c = _corpus(spark).unionByName(edge)
    fast = dedup.dedup_near(c, threshold=0.7)
    spec = dedup.dedup_near(c, threshold=0.7,
                            signatures="catalyst", verify="catalyst")
    fa = {(r.id_a, r.id_b): r.jaccard for r in fast.collect()}
    fb = {(r.id_a, r.id_b): r.jaccard for r in spec.collect()}
    assert fa == fb and len(fa) > 0
    # the identical-text edge pairs verify at jaccard 1.0 in both forms
    assert fa[(900001, 900011)] == 1.0
    assert fa[(900004, 900012)] == 1.0


def test_dedup_caches_released(spark):
    """dedup_near / hamming_near_pairs materialize-then-unpersist their
    internal caches: repeated calls accrete no DataFrame cache entries."""
    spark.catalog.clearCache()
    c = _corpus(spark)
    for _ in range(2):
        dedup.dedup_near(c, threshold=0.7).count()
        dedup.hamming_near_pairs(
            c.selectExpr("doc_id as id", "doc_id * 7 as h"), "id", "h").count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_enrich_images_hex_equals_ring_on_seam_straddling_fixture(spark):
    """r4 verdict #7: the flagship with knn_strategy=\"hex\" must produce
    the SAME enrichment as knn_strategy=\"ring\" — exercised on a global
    scatter so points and addresses straddle icosahedron face seams (the
    hex path's hard case; both strategies share the exact-top-k contract
    and the (dist, addr_id) tie-break)."""
    from p3_osm_transformer_spark.plans.pipeline import enrich_images_scope

    imgs = spark.createDataFrame(
        [(f"img-{i:04d}",
          f"scatter shot {i} @ geo:"
          f"{-83.0 + (i * 7 % 1660) / 10.0:.7f},"
          f"{-180 + (i * 53 % 360) + 0.4321:.7f}")
         for i in range(120)]
        + [(f"img-ng{i}", f"untagged snapshot {i}") for i in range(8)],
        "image_id string, caption string") \
        .withColumn("bytes", F.lit(None).cast("binary")) \
        .withColumn("phash", F.lit(0).cast("long"))
    addrs = spark.createDataFrame(
        [(f"a-{i}", f"{i} Scatter Way",
          -84.0 + (i * 13 % 1680) / 10.0, -180 + (i * 37 % 360) * 1.0)
         for i in range(600)],
        "addr_id string, street_address string, lat double, lon double")

    def picks(strategy):
        with enrich_images_scope(imgs, addrs, knn_strategy=strategy) as df:
            return {(r.image_id, r.nearest_addr_id, r.hex_9, r.s2_12)
                    for r in df.collect()}

    ring, hexed = picks("ring"), picks("hex")
    assert hexed == ring
    assert len(ring) == 128          # every input row, geo or not


def test_enrich_cache_bounded_and_releasable(spark):
    """enrich_images persists its branch-point table past return (the
    output is lazy); repeated calls must hold at most ONE live cache and
    release_enrich_cache() must drop it (ADVICE r2: unbounded accretion)."""
    from p3_osm_transformer_spark.operators.osm import build_addresses
    from p3_osm_transformer_spark.plans.pipeline import (
        enrich_images, release_enrich_cache)
    from p3_osm_transformer_spark.sources import fixtures as fx
    spark.catalog.clearCache()
    imgs = fx.images_table(spark, 40)
    addrs = build_addresses(fx.osm_nodes(spark, 400),
                            fx.osm_ways(spark, 60, 400))
    cm = spark._jsparkSession.sharedState().cacheManager()
    for _ in range(3):
        enrich_images(imgs, addrs, knn_strategy="brute").count()
    assert not cm.isEmpty()          # the current call's cache is live
    release_enrich_cache()
    assert cm.isEmpty()              # and exactly that one was held
    # context-manager form: released at block exit, no module-global left
    from p3_osm_transformer_spark.plans.pipeline import enrich_images_scope
    with enrich_images_scope(imgs, addrs, knn_strategy="brute") as df:
        assert df.count() > 0
        assert not cm.isEmpty()
    assert cm.isEmpty()
