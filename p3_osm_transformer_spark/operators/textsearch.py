"""Keyword search over a triple/address store — the JenaTextConfig twin.

The reference wraps a Jena dataset with a Lucene index on exactly one
predicate (schema:streetAddress, JenaTextConfig.java:52-55) and serves
``text:query`` keyword lookups (E3).  The engine's re-specification
(SURVEY.md §2 F7): analyzed match = case-folded alphanumeric tokens,
hit = query term ∈ token set.  The "index" is the token layout: at write
time ``with_search_tokens`` explodes the indexed column into a posting
table (token → subject) that an Iceberg/parquet table would partition by
token prefix — a keyword probe is then a partition-pruned equi-join, the
cluster analogue of a Lucene postings lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.geocode import street_tokens


def with_search_tokens(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn("_tokens", street_tokens(F.col(col)))


def build_postings(df: DataFrame, subject_col: str, col: str) -> DataFrame:
    """(token, subject) posting table — the write-time 'index build'."""
    return (with_search_tokens(df, col)
            .select(F.explode("_tokens").alias("token"),
                    F.col(subject_col).alias("subject"))
            .distinct())


def text_query(postings: DataFrame, term: str) -> DataFrame:
    """Lucene ``text:query (schema:streetAddress '<term>')`` analogue:
    case-folded term probe against the posting table."""
    return (postings.filter(F.col("token") == term.lower())
            .select("subject").distinct())


def text_query_scan(df: DataFrame, subject_col: str, col: str,
                    term: str) -> DataFrame:
    """Index-free variant (full scan + arrays_overlap) — same semantics;
    used to cross-check the posting-table path."""
    return (with_search_tokens(df, col)
            .filter(F.array_contains("_tokens", term.lower()))
            .select(F.col(subject_col).alias("subject")).distinct())
