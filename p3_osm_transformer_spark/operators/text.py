"""Text analysis operators (training-data pipeline extensions).

All pure Catalyst (regexp/array built-ins inside whole-stage codegen):

* language-ID   — marker-word scoring (deterministic spec; ties → priority
                  order).  An n-gram-frequency variant rides the same shape.
* quality score — length / punctuation-ratio / stopword-ratio / mean word
                  length, combined into [0,1].
* token count   — whitespace tokens + a BPE-ish subword estimate
                  (chars/3.2 blend, the public rule-of-thumb).
* fingerprint   — min-rolling-hash (winnowing-lite): min over character
                  k-gram md5s; robust to reordering at window scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LANG_MARKERS = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}
_PRIORITY = ["en", "de", "fr", "es"]

STOPWORDS_RE = r"\b(the|a|of|and|is|to|in|it|that|for)\b"


def lang_scores(text_col: str) -> list[F.Column]:
    return [F.regexp_count(F.lower(F.col(text_col)), F.lit(pat)).alias(f"score_{lang}")
            for lang, pat in LANG_MARKERS.items()]


def with_langid(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_guess") -> DataFrame:
    scored = df.select("*", *lang_scores(text_col))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pick = F.lit(_PRIORITY[0])
    # reverse priority: earlier languages win ties
    for lang in reversed(_PRIORITY):
        pick = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pick)
    return (scored.withColumn(out_col, F.when(best > 0, pick).otherwise(F.lit("und")))
            .drop(*[f"score_{lang}" for lang in LANG_MARKERS]))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, punct_ratio, stopword_ratio, mean_word_len, quality."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    stops = F.regexp_count(F.lower(F.col(text_col)), F.lit(STOPWORDS_RE))
    out = (df.withColumn("n_tokens", n_tok.cast("bigint"))
             .withColumn("punct_ratio",
                         F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
             .withColumn("stopword_ratio",
                         F.round(stops / F.greatest(n_tok, F.lit(1)).cast("double"), 6))
             .withColumn("mean_word_len", F.round(
                 (n_chars - n_tok + 1) / F.greatest(n_tok, F.lit(1)).cast("double"), 6)))
    # quality heuristic: soft gates, each in [0,1], multiplied
    len_gate = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    punct_gate = F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    stop_gate = F.least(F.col("stopword_ratio") * 4.0 + 0.2, F.lit(1.0))
    return out.withColumn("quality", F.round(len_gate * punct_gate * stop_gate, 6))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a subword (BPE-ish) estimate:
    max(words, ceil(chars / 3.2)) — the public ~4-chars-per-token rule,
    floored by the word count."""
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    sub = F.ceil(F.length(text_col) / F.lit(3.2))
    return (df.withColumn("n_words", toks.cast("bigint"))
              .withColumn("n_subword_est",
                          F.greatest(toks.cast("bigint"), sub.cast("bigint"))))


def with_fingerprint(df: DataFrame, text_col: str = "text", k: int = 12,
                     out_col: str = "fingerprint") -> DataFrame:
    """Min-hash over character k-grams of the normalized text: the
    winnowing-style document fingerprint, as pure column math (sequence →
    transform(substring) → array_min(md5))."""
    # materialize the normalized text first — otherwise the regexp_replace
    # re-runs per k-gram position inside the transform lambda
    df = df.withColumn(
        "_norm", F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {k} + 1, 1)),"
        f" i -> substring(_norm, i, {k}))")
    return (df.withColumn(out_col,
                          F.array_min(F.transform(grams,
                                                  lambda g: F.md5(g.cast("binary")))))
              .drop("_norm"))
