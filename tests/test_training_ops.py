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
    near = dedup.dedup_near(c, threshold=0.7)
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
