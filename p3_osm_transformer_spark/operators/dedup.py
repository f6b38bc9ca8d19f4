"""Deduplication operator family (training-data pipeline extensions).

Five dedup strategies over a (doc_id, text) corpus — all built-in-function
DataFrame pipelines (no Python in the hot path except where noted):

* exact          — md5(normalized text) hash-groupBy.
* minhash LSH    — shingle → per-seed min-hash → band → bucket self-join.
                   Portable construction (md5 string-min) so the DuckDB
                   oracle can replay signatures exactly.
* simhash        — sign-aggregated token hashes; Hamming-close pairs.
* ngram jaccard  — token-shingle overlap verification (the exact check run
                   on LSH candidate pairs: filter-refine, same shape as the
                   PIP join).
* embedding      — cosine near-duplicates (delegates to simsearch.py).

Scale notes: every self-join here is bucketed (band or hash prefix) before
any pairwise work — the candidate-pair count, not the corpus size, is the
O(n²) guard.  At 10^12 rows the band tables partition by band hash and the
per-bucket pair blow-up is bounded by per-bucket caps (`max_bucket`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ exact


def normalize_text(c: F.Column) -> F.Column:
    """Casefold + collapse whitespace — the canonicalization rule."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """One row per distinct content: canonical (min) id + member count."""
    h = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    return (docs.groupBy(h.alias("content_hash"))
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count("*").alias("n_copies")))


def dedup_exact_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(duplicate_id, canonical_id) mapping for non-canonical members."""
    h = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    d = docs.select(F.col(id_col).alias("member_id"), h.alias("content_hash"))
    canon = d.groupBy("content_hash").agg(F.min("member_id").alias("canonical_id"))
    return (d.join(canon, "content_hash")
            .filter(F.col("member_id") != F.col("canonical_id"))
            .select("member_id", "canonical_id"))


# ---------------------------------------------------------------- minhash

def tokens_of(text_col: str) -> F.Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                    lambda t: t != "")


def shingles_of(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles via sequence+transform (JVM-side, no UDF)."""
    toks = tokens_of(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))


# Universal-hash minhash family: ONE portable base hash per shingle
# (15-hex-char md5 prefix → 60-bit int, replayable bit-exact in any engine
# with md5), then h_i = (A_i·base + B_i) mod p — the classic (a·x+b) mod p
# universal family over the Mersenne prime 2^31−1 (the same construction
# Spark's MinHashLSH publishes).  Measured rationale: the previous
# construction paid n_hashes md5 calls + string-mins PER SHINGLE inside an
# interpreted higher-order aggregate — 122 core-seconds for a 20k-doc
# corpus, the dominant cost of dedup_near; the arithmetic family pays ONE
# md5 and n_hashes multiply-add-mods on longs (~6× less per-shingle work,
# same one-pass aggregate shape).
P_MINHASH = 2_147_483_647   # 2^31 − 1; A_i·base < 2^62 — no 64-bit overflow


def minhash_consts(n_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (A_i, B_i) pairs, derived from md5 so the DuckDB
    oracle (contract_ext._mh_sql) interpolates the identical literals."""
    import hashlib

    def h32(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)

    A = [h32(f"a:{i}") % (P_MINHASH - 1) + 1 for i in range(n_hashes)]
    B = [h32(f"b:{i}") % P_MINHASH for i in range(n_hashes)]
    return A, B


def _base_hash60(s: F.Column) -> F.Column:
    """Portable per-shingle base hash: first 15 hex chars of md5 — a
    60-bit int that fits a signed long, NOT reduced mod p (the mod-p
    reduction belongs inside the universal-hash family only; set-identity
    uses, e.g. the Jaccard ``hset``, need the full 60 bits — mod-p values
    are 31-bit and at ~10³ shingles/doc their cross-collision odds per
    candidate pair are ~5e-4, enough to flip pairs at a 0.7 threshold).
    DuckDB twin: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10) \
            .cast("long")


def _base_hash(s: F.Column) -> F.Column:
    """Mod-p base hash feeding the (a·x+b) mod p minhash family.  DuckDB
    twin: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % 2147483647."""
    return _base_hash60(s) % F.lit(P_MINHASH)


def minhash_signature(text_col: str, n_hashes: int = 8, shingle_n: int = 3) -> list[F.Column]:
    """Scalar-column minhash signature (long mh_i columns) — convenient for
    small inputs; the pipeline path (``minhash_signature_df``) is the
    production shape (Catalyst does not common-subexpression the shingle
    array across the n_hashes lambdas here)."""
    sh = shingles_of(text_col, shingle_n)
    A, B = minhash_consts(n_hashes)
    return [F.array_min(F.transform(
                sh, lambda s, i=i: (F.lit(A[i]) * _base_hash(s) + F.lit(B[i]))
                % F.lit(P_MINHASH))).alias(f"mh_{i}")
            for i in range(n_hashes)]


def _shingles_df(docs: DataFrame, id_col: str, text_col: str,
                 shingle_n: int) -> DataFrame:
    """(id, _sh) — word-shingle arrays, null-token docs dropped.

    The token array is LET-BOUND once per row via the single-element
    ``transform(array(tokens), t -> ...)`` trick: every inner reference
    (two sizes + one slice per shingle position) reads the lambda
    variable.  Naming tokens in a separate projection does NOT do this —
    CollapseProject inlines the split+filter into every lambda element,
    re-tokenizing the document once per shingle position (measured 10× on
    a 5k-doc corpus).  A repartition barrier would also work but costs a
    full-corpus exchange; the let-binding is free.
    """
    toks = tokens_of(text_col)

    def build(t: F.Column) -> F.Column:
        return F.when(
            F.size(t) >= shingle_n,
            F.transform(F.sequence(F.lit(0), F.size(t) - shingle_n),
                        lambda i: F.concat_ws(" ", F.slice(t, i + 1, shingle_n)))
        ).otherwise(F.array(F.concat_ws(" ", t)))

    sh_expr = F.element_at(F.transform(F.array(toks), build), 1)
    return (docs.select(F.col(id_col), sh_expr.alias("_sh"))
            .filter(F.col("_sh").isNotNull()))


def _exploded_hashes(docs: DataFrame, id_col: str, text_col: str,
                     shingle_n: int) -> DataFrame:
    """(id, _h) — one row per shingle occurrence, ``_h`` = the full
    60-bit md5-prefix base hash (see ``_base_hash60``; the mod-p
    reduction is applied downstream inside the minhash aggregates only).

    This is the whole-stage-codegen form of the minhash input: Generate
    (explode) + a codegen'd hash projection.  The r2 form computed the
    same hashes inside an interpreted ``F.aggregate`` lambda, which
    evaluates with boxed objects — ~150M transient java.lang.Long
    allocations on the 120k-doc bench corpus.  On this host the stage was
    memory-bandwidth-bound (a numpy stream control scales 8→32 cores at
    0.48 vs 0.94 for pure ALU), so the allocation traffic was the scaling
    ceiling, not the md5 work.  Measured on the bench corpus at
    local[32]: 90.1 CPU-s interpreted vs 61.9 CPU-s exploded, identical
    band-key checksums.
    """
    sh = _shingles_df(docs, id_col, text_col, shingle_n)
    return (sh.select(F.col(id_col), F.explode("_sh").alias("_s"))
            .select(F.col(id_col), _base_hash60(F.col("_s")).alias("_h")))


def _min_hash_aggs(n_hashes: int) -> list[F.Column]:
    """min((A_i·(h mod p) + B_i) mod p) aggregate columns over ``_h`` —
    the universal-hash minima as codegen'd HashAggregate expressions
    (long arithmetic in unsafe buffers, no boxing).  Values are
    bit-identical to the r2 interpreted accumulator: same mod-p base
    hash, same (A_i, B_i) literals, same mod-p arithmetic — the q25
    DuckDB oracle replays them unchanged."""
    A, B = minhash_consts(n_hashes)
    base = F.col("_h") % F.lit(P_MINHASH)
    return [F.min((F.lit(A[i]) * base + F.lit(B[i])) % F.lit(P_MINHASH))
            .alias(f"mh_{i}") for i in range(n_hashes)]


def _band_keys(n_hashes: int, band_size: int) -> F.Column:
    """array<string> of ':'-joined per-band minima from mh_i columns —
    bit-identical to the r2 finish-lambda band keys."""
    n_bands = n_hashes // band_size
    return F.array(*[
        F.concat_ws(":", *[F.col(f"mh_{b * band_size + j}").cast("string")
                           for j in range(band_size)])
        for b in range(n_bands)])


def _band_keys_long(n_hashes: int, band_size: int) -> F.Column:
    """array<long> band keys: xxhash64 over each band's minima columns —
    the ENGINE-INTERNAL join-key form (``dedup_near``'s default).  The
    ':'-joined string form above stays the public/spec form
    (``minhash_bands``, SQL-replayable) — this one exists because the
    band self-join and its bucket-size aggregate hash/compare the key on
    every one of the ~4 rows per document, and a fixed-width long
    beats a ~20-char UTF8String on both bytes shuffled and codegen
    compare cost (event-log attribution at DEDUP_EXTRA=1.2M/32 cores:
    the candidate stage read 19.1M string-keyed records for 92 CPU-s).

    Correctness: keys are only compared for equality, and the Jaccard
    verify downstream is EXACT, so an xxhash64 collision (odds ~2⁻⁶⁴ per
    band pair, ~1e-13 across a 5M-band corpus) can only add a spurious
    candidate that verify then rejects — the operator's OUTPUT is
    unchanged; only the max_bucket occupancy count could shift at those
    same odds."""
    n_bands = n_hashes // band_size
    return F.array(*[
        F.xxhash64(F.lit(b), *[F.col(f"mh_{b * band_size + j}")
                               for j in range(band_size)])
        for b in range(n_bands)])


def minhash_signature_df(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n_hashes: int = 8,
                         shingle_n: int = 3) -> DataFrame:
    """(id, mh_0..mh_{n-1}) — explode + codegen'd hash-aggregate minima.

    Plan: Generate → projection (one md5 per shingle) → partial
    HashAggregate (map-side min, runs where the shingles were generated)
    → one exchange of (id, n_hashes longs) → final HashAggregate.  Every
    operator is whole-stage-codegen; nothing is interpreted, nothing
    boxes.  The exchange moves one small fixed-width row per document —
    on a corpus bucketed by ``id_col`` (sources/bucketed.py) it is elided
    entirely, and dedup pipelines shuffle band keys right after anyway,
    so the agg exchange is never the marginal shuffle at scale.
    """
    ex = _exploded_hashes(docs, id_col, text_col, shingle_n)
    return ex.groupBy(id_col).agg(*_min_hash_aggs(n_hashes))


def minhash_bands(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n_hashes: int = 8,
                  band_size: int = 2, shingle_n: int = 3) -> DataFrame:
    """(id, band_idx, band_key) — LSH bucket keys from the codegen'd
    signature aggregate (see ``minhash_signature_df``), band keys joined
    post-agg and posexploded.  Band-key values are bit-identical to the
    r2 finish-lambda form (same minima, same ':' join), so the q25
    oracle replay is unchanged."""
    sig = minhash_signature_df(docs, id_col, text_col, n_hashes, shingle_n)
    return sig.select(
        F.col(id_col),
        F.posexplode(_band_keys(n_hashes, band_size))
         .alias("band_idx", "band_key"))


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 8,
                        band_size: int = 2, shingle_n: int = 3,
                        max_bucket: int = 1000) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band.

    max_bucket caps pathological buckets (all-identical spam): a bucket of
    m docs contributes m(m-1)/2 pairs; dropping buckets over the cap bounds
    the blow-up and the dropped content is by construction near-identical —
    exact-dedup (cheap) already collapses it.

    Cache hygiene: the band table feeds a size filter AND both sides of the
    pair self-join, so it is cached for the duration of the candidate join,
    the (small, capped) pair set is materialized eagerly, and the cache is
    released before returning — repeated calls in one session accrete no
    storage memory.  At warehouse scale the cache becomes a persisted
    signatures table instead.
    """
    bands = minhash_bands(docs, id_col, text_col, n_hashes, band_size,
                          shingle_n).cache()
    # window-count bucket guard — one exchange, reused by the self-join
    # on the same keys (see dedup_near)
    kept = (bands.withColumn(
                "_bn", F.count(F.lit(1)).over(
                    Window.partitionBy("band_idx", "band_key")))
            .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = kept.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = kept.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    pairs = (a.join(b, ["band_idx", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct()
             .localCheckpoint(eager=True))
    bands.unpersist()
    return pairs


# ---------------------------------------------------------------- jaccard

def jaccard_verify(pairs: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_n: int = 3, threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (the refine step)."""
    # joined twice (id_a and id_b sides) — cache the shingle-set table for
    # the duration of the verify join, materialize the (small) verified
    # pair set, release the cache before returning (no session accretion).
    # shingle arrays come from the let-bound builder (see _shingles_df).
    sh = (_shingles_df(docs, id_col, text_col, shingle_n)
          .select(F.col(id_col), F.array_distinct("_sh").alias("sh")).cache())
    j = (pairs
         .join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
         .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (j.withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint(eager=True))
    sh.unpersist()
    return out


def _jaccard_arrow():
    """Per-pair exact Jaccard over two distinct-long-array columns as ONE
    flat-batch numpy pass — the verify projection's scale form.

    The Catalyst twin (``size(array_intersect)/size(array_union)``)
    builds a boxed ``OpenHashSet[Any]`` per pair per operator: random
    pointer-chasing over ~80 heap objects per candidate.  Event-log
    attribution at DEDUP_EXTRA=1.2M (tools/dedup_tasks.py, 2.3M
    candidate pairs of ~40-long sets) measured the verify stage at 87
    CPU-s on 8 pinned cores vs 605-1400 CPU-s on 32 — 7-16× CPU
    inflation for identical work, the signature of an LLC-thrash-bound
    workload (per-thread working sets × threads outgrow the shared
    cache, so every probe becomes a DRAM miss); it anti-scales with
    cores and is the reason the stage's matched-window 8→32 efficiency
    sat below both host ceilings.

    The numpy form (same flat-batch idiom as ``_doc_signatures_arrow``):
    lexsort all (pair_idx, value) rows of a batch once — sequential
    streams, no per-pair allocation — and count adjacent duplicates per
    pair; |A∩B| = dups, |A∪B| = |A|+|B|−dups.  EXACT set arithmetic on
    the same int64 values, so results are bit-identical to the Catalyst
    twin (inputs are distinct-per-array by construction —
    ``_doc_signatures`` emits ``np.unique`` / ``collect_set`` sets).
    NULL semantics match Spark's non-ANSI Divide: NULL input or an
    empty union → NULL."""
    @F.pandas_udf("double")
    def _jac(sa: pd.Series, sb: pd.Series) -> pd.Series:
        n = len(sa)
        if n == 0:
            return pd.Series(np.empty(0, dtype=object))
        av, bv = sa.values, sb.values
        la = np.fromiter(
            (len(x) if x is not None else -1 for x in av), np.int64, n)
        lb = np.fromiter(
            (len(x) if x is not None else -1 for x in bv), np.int64, n)
        ok = (la >= 0) & (lb >= 0)
        la0 = np.where(ok, la, 0)
        lb0 = np.where(ok, lb, 0)
        flat_a = np.concatenate(
            [np.asarray(x, dtype=np.int64) if k else np.empty(0, np.int64)
             for x, k in zip(av, ok)]) if n else np.empty(0, np.int64)
        flat_b = np.concatenate(
            [np.asarray(x, dtype=np.int64) if k else np.empty(0, np.int64)
             for x, k in zip(bv, ok)]) if n else np.empty(0, np.int64)
        idx = np.concatenate([np.repeat(np.arange(n), la0),
                              np.repeat(np.arange(n), lb0)])
        vals = np.concatenate([flat_a, flat_b])
        order = np.lexsort((vals, idx))
        iv, vv = idx[order], vals[order]
        dup = (iv[1:] == iv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.bincount(iv[1:][dup], minlength=n).astype(np.float64)
        union = (la0 + lb0).astype(np.float64) - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = inter / union
        out = np.empty(n, dtype=object)
        good = ok & (union > 0)
        for i in np.nonzero(good)[0]:
            out[i] = float(jac[i])
        return pd.Series(out)

    # Evaluate-once barrier, NOT a semantic statement (the function is
    # pure): Catalyst duplicates a deterministic UDF below any filter
    # that references its output — dedup_near's threshold filter
    # produced TWO ArrowEvalPython nodes, i.e. the full per-pair verify
    # exchange run twice (plan-audited).  Nondeterministic projections
    # are pushdown barriers, so the UDF runs exactly once and the
    # filter reads the projected column.
    return _jac.asNondeterministic()


def _doc_signatures_arrow(docs: DataFrame, id_col: str, text_col: str,
                          n_hashes: int, shingle_n: int) -> DataFrame:
    """(id, mh_0..mh_{n-1}, hset) via ONE Arrow ``mapInPandas`` pass —
    bit-identical values to the Catalyst construction (same word
    shingles, same 15-hex-char md5-prefix 60-bit base hashes, same
    (A·x+B) mod p universal-hash minima; property-tested equal), chosen
    for the signature pass because the measured problem is JVM
    allocation, not arithmetic:

    Catalyst form, profiled at DEDUP_EXTRA=400k (420k docs, ~17M
    shingles; tools/dedup_profile.py, whole-host /proc/stat busy time):
    wall 11.5s / 82 CPU-s at 8 pinned cores vs wall 12.0s / 318 CPU-s at
    32 — the same work burns 4× the CPU with ZERO wall gain, i.e. the
    stage saturates the host's memory system at 8 cores and extra cores
    only divide the bandwidth (below even the 0.60 stream-control
    ceiling, because the interpreted higher-order shingle lambdas box
    every long and build 5-7 transient objects per shingle: slice array,
    concat string, binary cast, md5 hex string, substring, conv decimal
    string).  The Arrow pass computes the same 17M md5s in worker
    PROCESSES with refcounted small-object churn and batch-vectorized
    numpy minima (np.minimum.reduceat over a flat per-batch hash
    array) — ~8× less allocation traffic, and per-process heaps scale
    with cores instead of contending on one shared GC.

    Tokenization parity note: Python ``str.lower``/ASCII regex split
    match Spark's lower/split for the a-z0-9 token alphabet; both twins
    (Catalyst + DuckDB oracle) use the same rule.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    A, B = minhash_consts(n_hashes)
    a_arr = np.array(A, dtype=np.uint64)[:, None]
    b_arr = np.array(B, dtype=np.uint64)[:, None]
    p = np.uint64(P_MINHASH)

    schema = T.StructType(
        [T.StructField(id_col, docs.schema[id_col].dataType)]
        + [T.StructField(f"mh_{i}", T.LongType()) for i in range(n_hashes)]
        + [T.StructField("hset", T.ArrayType(T.LongType()))])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import re
        tok_re = re.compile(r"[^a-z0-9]+")
        md5 = hashlib.md5
        for pdf in batches:
            ids, offs, flat = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    # Catalyst twin: concat_ws over the null token array
                    # yields "" → the doc keeps one empty-string shingle
                    text = ""
                toks = [t for t in tok_re.split(text.lower()) if t]
                if len(toks) >= shingle_n:
                    sh = [" ".join(toks[i:i + shingle_n])
                          for i in range(len(toks) - shingle_n + 1)]
                else:
                    # <n tokens → ONE whole-text shingle ("" for empty),
                    # same fallback as shingles_of
                    sh = [" ".join(toks)]
                ids.append(did)
                offs.append(len(flat))
                # 60-bit base hash = first 15 hex chars of md5 = top 60
                # bits of the first 8 digest bytes (same value as
                # _base_hash60's conv(substring(md5,1,15),16,10))
                flat.extend(
                    int.from_bytes(md5(s.encode()).digest()[:8], "big") >> 4
                    for s in sh)
            if not ids:
                continue
            hs = np.array(flat, dtype=np.uint64)
            sig = (a_arr * (hs % p)[None, :] + b_arr) % p
            mins = np.minimum.reduceat(sig, np.array(offs, dtype=np.int64),
                                       axis=1)
            ends = offs[1:] + [len(flat)]
            out = {id_col: ids}
            for i in range(n_hashes):
                out[f"mh_{i}"] = mins[i].astype(np.int64)
            out["hset"] = [np.unique(hs[s:e]).astype(np.int64)
                           for s, e in zip(offs, ends)]
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def _doc_signatures(docs: DataFrame, id_col: str, text_col: str,
                    n_hashes: int, band_size: int,
                    shingle_n: int, impl: str = "arrow",
                    band_keys: str = "string") -> DataFrame:
    """(id, hset:array<long>, bands:array<string>) — the distinct
    shingle-HASH set AND the LSH band keys of every document, one
    tokenize + one md5-per-shingle pass.

    ``impl="arrow"`` (default, the scale path) computes the pass in one
    Arrow ``mapInPandas`` stage (``_doc_signatures_arrow`` — measured 4×
    CPU inflation at 32 cores in the JVM form; values bit-identical).
    ``impl="catalyst"`` keeps the pure-DataFrame construction below — the
    SQL-replayable spec form and the parity-test twin.

    ``hset`` carries the FULL 60-bit base hashes (``_base_hash60`` — no
    mod-p reduction), not the shingle strings: the Jaccard refine only
    needs set intersection/union SIZES, which are preserved by any
    injective-enough hash — with ~10³ shingles per document pair the
    per-pair cross-collision odds at 60 bits are ~1e-12 (at the 31-bit
    mod-p values they would be ~5e-4, enough to flip pairs sitting at
    the threshold — that's why the mod stays inside the minhash family
    only).  The q25 DuckDB oracle computes the SAME 60-bit sets, so even
    a collision cannot diverge engine from oracle.  Longs instead of
    ~25-byte strings cut the checkpoint + verify-join bytes ~3× and keep
    array_intersect on fixed-width values (no string compares) — this
    table is materialized once and read from three sides (band explode,
    verify id_a side, verify id_b side)."""
    if impl == "arrow":
        sig = _doc_signatures_arrow(docs, id_col, text_col, n_hashes,
                                    shingle_n)
    else:
        ex = _exploded_hashes(docs, id_col, text_col, shingle_n)
        sig = ex.groupBy(id_col).agg(*_min_hash_aggs(n_hashes),
                                     F.collect_set("_h").alias("hset"))
    bk = (_band_keys_long if band_keys == "long"
          else _band_keys)(n_hashes, band_size)
    return sig.select(F.col(id_col), F.col("hset"), bk.alias("bands"))


def dedup_near(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               threshold: float = 0.7, n_hashes: int = 8, band_size: int = 2,
               shingle_n: int = 3, max_bucket: int = 1000,
               eager: bool = False, signatures: str = "arrow",
               verify: str = "arrow") -> DataFrame:
    """Full near-dup pipeline: LSH candidates → Jaccard verify, ONE driver
    action inside (the signature checkpoint) — the candidates→verify plan
    is returned LAZY, so the caller's own materialization (noop write,
    snapshot, collect) is the second and last action.  Every driver
    action costs ~0.5-1.3s of serial Catalyst+scheduling dead time that
    no executor count can shrink, so the action count IS the serial floor
    of the stage's core-scaling.

    Shape rationale, measured (event-log breakdowns at local[32], 20k-doc
    corpus):

    * The r2 staged form (lsh_candidate_pairs → jaccard_verify) paid ~5
      driver actions — two cache fills, two eager checkpoints, a final
      count — each costing ~1-1.3s of driver-serial Catalyst+codegen dead
      time between jobs (~8.5s total) that no executor count can shrink.
    * A fully-fused one-action form is WORSE: the band self-join's two
      sides and the verify join's two sides all scan the still-cold
      .cache()'d tables concurrently in one job wave, so the minhash ran
      ~3× with cache-write contention (stages of 200-400 task-seconds vs
      ~30s of real CPU).

    The correct shape is one EAGER materialization of the per-document
    signature table (shingle-hash set + band keys, one tokenize + one
    minhash pass — ``_doc_signatures``), then the whole candidates→verify
    plan reads those checkpointed blocks from every side.  localCheckpoint
    (not .cache) holds the blocks: downstream stages never race a cold
    cache, there is no cache-manager entry to leak, and the driver's
    ContextCleaner frees the blocks when the result — whose lineage pins
    them — goes out of scope.  At 10^12 rows the signature checkpoint
    becomes a persisted signatures table (sources/catalog.py snapshot)
    and the verify's explicit repartition is the shuffle that distributes
    candidate pairs across the cluster.  Callers that act on the result
    more than once should materialize it themselves (snapshot write /
    .cache, or pass ``eager=True``) — the r2 unconditional terminal
    checkpoint protected that case but charged every single-action
    caller a whole extra driver round-trip.

    The verify join repartitions pairs explicitly: AQE coalesces by BYTES,
    and 40k candidate pairs are tiny on disk but carry ~20ms of
    array_intersect CPU each — byte-coalescing collapsed the verify stage
    to 1 task (19s serial, measured).  An explicit numbered repartition is
    exempt from AQE coalescing, so the expensive projection keeps cluster
    parallelism.
    """
    spark = docs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # signatures="arrow" (default): the measured scale path — the JVM
    # construction burns 4× the CPU at 32 cores for the same values
    # (_doc_signatures_arrow docstring); "catalyst" keeps the pure-
    # DataFrame spec form (parity-tested equal)
    # band_keys="long": fixed-width engine-internal join keys (see
    # _band_keys_long — the string form remains the public spec form)
    sig = _doc_signatures(docs, id_col, text_col, n_hashes, band_size,
                          shingle_n, impl=signatures, band_keys="long") \
        .localCheckpoint(eager=True)

    bands = sig.select(id_col, F.posexplode("bands")
                       .alias("band_idx", "band_key"))
    # Bucket-size guard as a WINDOW count, not groupBy+re-join (r5.6):
    # the aggregate form shuffled the band table twice (once into the
    # count aggregate, once for the sizes join) and evaluated the
    # checkpoint-read+posexplode three times (sizes, join side a, join
    # side b).  count() over the (band_idx, band_key) partition needs
    # ONE exchange+sort — and the band self-join below joins on the SAME
    # keys, so AQE reuses the materialized shuffle stage for both sides
    # at runtime (measured, tools/dedup_tasks.py at DEDUP_EXTRA=1.2M:
    # the duplicate 66 MB band-exchange stage disappears and the
    # candidate-join stage's shuffle read drops 304→171 MB; the INITIAL
    # plan cannot show ReusedExchange under AQE — reuse happens in the
    # adaptive stage cache).  _bn values are identical by definition.
    # Same shape as ann_lsh's hot-bucket cap (simsearch.py
    # cosine_topk_lsh).
    wb = Window.partitionBy("band_idx", "band_key")
    kept = (bands.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = kept.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = kept.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    pairs = (a.join(b, ["band_idx", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct()
             .repartition(n_part, "id_a"))
    # Jaccard over the shingle-HASH sets (see _doc_signatures: size-
    # preserving modulo 2^-60 collisions, and the q25 oracle hashes the
    # same way) — fixed-width long intersects, ~3× fewer joined bytes
    # than shingle strings.
    sh = sig.select(id_col, "hset")
    j = (pairs
         .join(sh.select(F.col(id_col).alias("id_a"), F.col("hset").alias("sh_a")), "id_a")
         .join(sh.select(F.col(id_col).alias("id_b"), F.col("hset").alias("sh_b")), "id_b"))
    if verify == "arrow":
        # flat-batch numpy set arithmetic (see _jaccard_arrow: the boxed
        # array_intersect/array_union form burned 605-1400 CPU-s at 32
        # cores vs 87 at 8 on the same 2.3M pairs — LLC-thrash-bound)
        raw = _jaccard_arrow()(F.col("sh_a"), F.col("sh_b"))
    else:
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        raw = inter / union
    out = (j.withColumn("jaccard", F.round(raw, 6))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    if eager:
        # escape hatch for multi-action callers: materialize once so each
        # subsequent action reads checkpointed blocks instead of re-running
        # the candidates→verify join (costs one extra driver round-trip —
        # single-action callers should leave this off)
        out = out.localCheckpoint(eager=True)
    return out


# ---------------------------------------------------------------- simhash

def simhash16(text_col: str) -> F.Column:
    """Portable 16-dim simhash: per hex position of each token's md5,
    vote +1 if the nibble ≥ 8 else −1; fingerprint bit = sign.  Returned as
    a 16-char '0'/'1' string (SQL-replayable).  The 64-bit numpy variant
    below is the scale implementation; this one is the oracle-checkable
    spec."""
    toks = tokens_of(text_col)

    def voter(pos: int):
        def merge(acc, t):
            return acc + F.when(
                F.substring(F.md5(t.cast("binary")), pos, 1)
                 .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)
        return merge

    bits = []
    for i in range(1, 17):
        vote = F.aggregate(toks, F.lit(0), voter(i))
        bits.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash64_np(texts) -> "list[int]":
    """64-bit simhash, vectorized numpy (engine scale path; used via
    mapInPandas when corpus text is already in Arrow batches)."""
    import hashlib

    import numpy as np
    out = []
    for t in texts:
        toks = [w for w in "".join(c if c.isalnum() else " " for c in t.lower()).split() if w]
        if not toks:
            out.append(0)
            continue
        hs = np.array([int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                       for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = (bits * 2 - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                fp |= np.uint64(1) << np.uint64(b)
        out.append(int(fp.astype(np.int64)))
    return out


# ---------------------------------------------------------- simhash @ scale

def with_simhash64(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, simhash64) via Arrow-batched mapInPandas (the scale path for
    the 64-bit fingerprint; simhash16 above is the SQL-replayable spec)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, docs.schema[id_col].dataType),
        T.StructField("simhash64", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "simhash64": simhash64_np(list(pdf[text_col])),
            })

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def hamming_near_pairs(df: DataFrame, id_col: str, hash_col: str,
                       max_hamming: int = 3,
                       max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs over ANY int64 fingerprint column by Hamming
    distance ≤ max_hamming (≤ 3 guaranteed-complete).

    Scale plan — the classic 4-band pigeonhole: split the 64 bits into
    4 × 16-bit bands; any pair within Hamming ≤ 3 matches exactly on ≥ 1
    band (pigeonhole over 4 bands), so candidates come from 4 bucket
    self-joins, then the exact popcount filter runs on candidates only.
    Serves both text simhash64 and image perceptual-hash (``phash``)
    columns — the image near-dup path of the input_hint schema.

    Band values are extracted with ``>>> b*16 & 0xFFFF`` — a sign-safe
    unsigned mask, NOT ``% 65536`` (Spark's ``%`` is sign-preserving, so
    negative int64 fingerprints — bit 63 set, ~half of real simhash/phash
    outputs — would get a different band-0 value than a positive hash with
    identical low 16 bits, silently dropping pairs whose only matching
    band is band 0).

    ``max_bucket`` drops degenerate hot band-buckets (solid-color images,
    boilerplate text share a band value by the thousands → m²/2 candidate
    blow-up); the dropped content is near-identical by construction, which
    exact dedup (cheap, runs first in any real pipeline) already collapses
    — same trade as ``lsh_candidate_pairs``.
    """
    bands = []
    for b in range(4):
        band = (F.shiftrightunsigned(F.col(hash_col), b * 16)
                .bitwiseAND(F.lit(65535)))
        bands.append(F.struct(F.lit(b).alias("band_idx"), band.alias("band_val")))
    # the band table feeds the size filter AND both self-join sides (and
    # the fingerprint may come from a Python mapInPandas stage) — cache for
    # the candidate join, materialize the small pair set, release
    keyed = (df.select(id_col, hash_col, F.explode(F.array(*bands)).alias("b"))
             .select(id_col, hash_col, F.col("b.band_idx"), F.col("b.band_val"))
             .cache())
    sizes = keyed.groupBy("band_idx", "band_val").agg(F.count("*").alias("_bn"))
    kept = (keyed.join(sizes, ["band_idx", "band_val"])
            .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = kept.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"),
                    "band_idx", "band_val")
    b_ = kept.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"),
                     "band_idx", "band_val")
    cand = (a.join(b_, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "h_a", "h_b").distinct())
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    out = (cand.withColumn("hamming", ham)
           .filter(F.col("hamming") <= max_hamming)
           .select("id_a", "id_b", "hamming")
           .localCheckpoint(eager=True))
    keyed.unpersist()
    return out


def phash_near_pairs(images: DataFrame, id_col: str = "image_id",
                     phash_col: str = "phash",
                     max_hamming: int = 3,
                     max_bucket: int = 1000) -> DataFrame:
    """Image near-duplicates by perceptual-hash Hamming distance — the
    banded plan over the input_hint table's ``phash:int64`` column.

    ``max_bucket`` is surfaced (not silently inherited) because the capped
    plan diverges from an uncapped oracle exactly when >max_bucket images
    share a 16-bit band value — callers verifying against an exhaustive
    twin (q47) must pass an effectively-unbounded cap."""
    return hamming_near_pairs(images, id_col, phash_col, max_hamming,
                              max_bucket=max_bucket)


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3,
                       max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs by 64-bit simhash Hamming distance ≤ max_hamming
    (see hamming_near_pairs for the banded plan; ``max_bucket`` surfaced
    for the same oracle-divergence reason as phash_near_pairs — q45's
    exhaustive twin needs an unbounded cap)."""
    sh = with_simhash64(docs, id_col, text_col)
    return hamming_near_pairs(sh, id_col, "simhash64", max_hamming,
                              max_bucket=max_bucket)
