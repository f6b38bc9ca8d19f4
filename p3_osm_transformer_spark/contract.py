"""Driver-contract queries: Spark implementation + DuckDB oracle twins.

Each operator family from SURVEY.md §2 gets (a) a Spark DataFrame callable
``(spark, sf_dir) -> DataFrame`` and (b) an ANSI-SQL twin DuckDB runs on the
same parquet.  Geospatial inputs are derived deterministically from TPC-H
keys with **integer-and-IEEE-arithmetic-only** formulas so Spark and DuckDB
produce bit-identical doubles (only +,-,*,/ and floor/cast — no libm in
join keys; transcendentals appear only where rounding makes the comparison
robust).

Column-name discipline: every computed column is aliased identically on
both sides (driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from p3_osm_transformer_spark.functions.geocell import (
    cell_id, cell_id_sql, haversine_m, haversine_m_sql)
from p3_osm_transformer_spark.functions.tiles import tile_id, tile_id_sql

# --------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Deterministic point derivation from an integer key (portable: int ops + /)
def point_cols(key: F.Column) -> tuple[F.Column, F.Column]:
    hot = (key % 10) < 3
    lat = F.when(hot, F.lit(42.3600902) + ((key % 2000) - 1000) / F.lit(100000.0)) \
           .otherwise(((key * 9973) % 160000) / F.lit(1000.0) - F.lit(80.0))
    lon = F.when(hot, F.lit(10.9195731) + (((key * 7) % 3000) - 1500) / F.lit(100000.0)) \
           .otherwise(((key * 7919) % 360000) / F.lit(1000.0) - F.lit(180.0))
    return lon, lat


def point_sql(key: str) -> tuple[str, str]:
    lat = (f"(CASE WHEN ({key}) % 10 < 3 THEN 42.3600902 + ((({key}) % 2000) - 1000) / 100000.0"
           f" ELSE ((({key}) * 9973) % 160000) / 1000.0 - 80.0 END)")
    lon = (f"(CASE WHEN ({key}) % 10 < 3 THEN 10.9195731 + (((({key}) * 7) % 3000) - 1500) / 100000.0"
           f" ELSE ((({key}) * 7919) % 360000) / 1000.0 - 180.0 END)")
    return lon, lat


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# =============================================================== relational core
# F1/F6 — predicate + projection pushdown to the parquet scan
@q("q01_filter_project", """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity > 45.0 AND l_returnflag = 'R'
""")
def q01(spark, sf_dir):
    return (_t(spark, sf_dir, "lineitem")
            .filter((F.col("l_quantity") > 45.0) & (F.col("l_returnflag") == "R"))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))


# J1/J2 — the way⋈node equi-join family (Catalyst SMJ/BHJ)
@q("q02_equi_join", """
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""")
def q02(spark, sf_dir):
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("mktsegment"))
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("sum_price")))


# J3 — broadcast dim join chain (XSLT key() hash-index analogue)
@q("q03_broadcast_dim_join", """
SELECT r.r_name AS region, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""")
def q03(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (c.join(n, c.c_nationkey == n.n_nationkey)
             .join(r, n.n_regionkey == r.r_regionkey)
             .groupBy(F.col("r_name").alias("region"))
             .agg(F.count("*").alias("n_customers")))


# J2 semi-join reduction (OsmXmlParser.java:225-244 re-specified)
@q("q04_semi_join", """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
""")
def q04(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi") \
            .select("c_custkey", "c_name")


# anti-join — the resume/checkpoint primitive (streaming/resume.py)
@q("q05_anti_join", """
SELECT p_partkey, p_name FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
""")
def q05(spark, sf_dir):
    p, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti") \
            .select("p_partkey", "p_name")


# A-family group agg (TPC-H Q1 shape; map-side partials built in)
@q("q06_group_agg", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def q06(spark, sf_dir):
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"),
                 F.count("*").alias("n_rows")))


# W2/J4 — first-element-per-group (the way anchor-point semantic)
@q("q07_first_per_group", """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
  FROM lineitem) WHERE rn = 1
""")
def q07(spark, sf_dir):
    # (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
    # full deterministic tie-break over every projected column.
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_quantity")
    return (_t(spark, sf_dir, "lineitem")
            .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))


# A1+A2 — ordered collect + string-agg (the WKT assembly semantic,
# OsmXmlParser.java:318-330 re-specified over lineitem)
@q("q08_ordered_collect", """
SELECT l_orderkey,
       'LINESTRING (' || STRING_AGG(printf('%d %.2f', l_linenumber, l_quantity),
                                    ', ' ORDER BY l_linenumber, l_quantity) || ')' AS wkt,
       COUNT(*) AS n_pts
FROM lineitem GROUP BY l_orderkey
""")
def q08(spark, sf_dir):
    pts = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity")))
    fmt = lambda p: F.format_string("%d %.2f", p["l_linenumber"], p["l_quantity"])  # noqa: E731
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.concat(F.lit("LINESTRING ("),
                          F.concat_ws(", ", F.transform(pts, fmt)),
                          F.lit(")")).alias("wkt"),
                 F.count("*").alias("n_pts")))


# A4 distinct
@q("q09_distinct", """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""")
def q09(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# U1 union (incremental graph-union semantic, JenaTextConfig.java:142-159)
@q("q10_union", """
SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind FROM customer
UNION ALL
SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind FROM supplier
""")
def q10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"), F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"), F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"))
    return c.unionByName(s)


# top-k per group window (kNN ranking shape on relational data)
@q("q11_topk_window", """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""")
def q11(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (_t(spark, sf_dir, "orders")
            .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice"))


# =============================================================== geospatial
_LON_C, _LAT_C = point_sql("c_custkey")
_LON_S, _LAT_S = point_sql("s_suppkey * 7 + 3")


# geocell encode — the index-build move (E3): points → multi-res cells
@q("q12_cell_encode", f"""
SELECT c_custkey, {cell_id_sql(_LON_C, _LAT_C, 15)} AS cell_r7,
       {cell_id_sql(_LON_C, _LAT_C, 16)} AS cell_r8
FROM customer
""")
def q12(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lon, lat = point_cols(F.col("c_custkey"))
    return c.select("c_custkey",
                    cell_id(lon, lat, 15).alias("cell_r7"),
                    cell_id(lon, lat, 16).alias("cell_r8"))


# slippy tile assignment + per-tile counts (skew detection agg, A-ext)
@q("q13_tile_assign", f"""
SELECT tile_z12, COUNT(*) AS n_points FROM (
  SELECT {tile_id_sql(_LON_C, _LAT_C, 12)} AS tile_z12 FROM customer)
GROUP BY tile_z12
""")
def q13(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lon, lat = point_cols(F.col("c_custkey"))
    return (c.select(tile_id(lon, lat, 12).alias("tile_z12"))
             .groupBy("tile_z12").agg(F.count("*").alias("n_points")))


# PIP rectangle join — the oracle-checkable half of the filter-refine PIP
@q("q14_pip_rect", f"""
SELECT c.c_custkey, n.n_nationkey
FROM customer c JOIN nation n
  ON {_LON_C} >= ((n.n_nationkey * 131) % 340) - 170.0
 AND {_LON_C} <= ((n.n_nationkey * 131) % 340) - 170.0 + 30.0
 AND {_LAT_C} >= ((n.n_nationkey * 89) % 150) - 75.0
 AND {_LAT_C} <= ((n.n_nationkey * 89) % 150) - 75.0 + 20.0
""")
def q14(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    lon, lat = point_cols(F.col("c_custkey"))
    pts = c.select("c_custkey", lon.alias("lon"), lat.alias("lat"))
    rects = n.select(
        "n_nationkey",
        (((F.col("n_nationkey") * 131) % 340) - 170.0).alias("bbox_lon0"),
        (((F.col("n_nationkey") * 89) % 150) - 75.0).alias("bbox_lat0")) \
        .withColumn("bbox_lon1", F.col("bbox_lon0") + 30.0) \
        .withColumn("bbox_lat1", F.col("bbox_lat0") + 20.0)
    from p3_osm_transformer_spark.operators.pip import pip_join_rect
    return pip_join_rect(pts, F.broadcast(rects)).select("c_custkey", "n_nationkey")


_KNN_ORACLE = f"""
SELECT c_custkey, s_suppkey, ROUND(dist_m, 1) AS dist_m FROM (
  SELECT c.c_custkey, s.s_suppkey,
         {haversine_m_sql(_LON_C, _LAT_C, _LON_S, _LAT_S)} AS dist_m,
         ROW_NUMBER() OVER (PARTITION BY c.c_custkey
             ORDER BY {haversine_m_sql(_LON_C, _LAT_C, _LON_S, _LAT_S)}, s.s_suppkey) AS rn
  FROM customer c CROSS JOIN supplier s) WHERE rn = 1
"""


def _knn_inputs(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    lon, lat = point_cols(F.col("c_custkey"))
    pts = c.select(F.col("c_custkey").alias("point_id"), lon.alias("lon"), lat.alias("lat"))
    slon, slat = point_cols(F.col("s_suppkey") * 7 + 3)
    addrs = s.select(F.col("s_suppkey").alias("addr_id"),
                     slon.alias("lon"), slat.alias("lat"))
    return pts, addrs


# kNN brute force (the oracle plan — correct when one side is tiny)
@q("q15_knn_brute", _KNN_ORACLE)
def q15(spark, sf_dir):
    from p3_osm_transformer_spark.operators.knn import knn_bruteforce
    pts, addrs = _knn_inputs(spark, sf_dir)
    nn = knn_bruteforce(pts, addrs, k=1)
    return nn.select(F.col("point_id").alias("c_custkey"),
                     F.col("addr_id").alias("s_suppkey"),
                     F.round("dist_m", 1).alias("dist_m"))


# kNN via cell-ring expansion — same oracle ⇒ proves plan equivalence
@q("q16_knn_ring", _KNN_ORACLE)
def q16(spark, sf_dir):
    from p3_osm_transformer_spark.operators.knn import knn_ring
    pts, addrs = _knn_inputs(spark, sf_dir)
    nn = knn_ring(pts, addrs, k=1, g=12, start_ring=2, max_rounds=2)
    return nn.select(F.col("point_id").alias("c_custkey"),
                     F.col("addr_id").alias("s_suppkey"),
                     F.round("dist_m", 1).alias("dist_m"))


# geotag round-trip: synthesize caption → regexp-extract (operators/geotag.py)
_LON_D, _LAT_D = point_sql("doc_id + 17")


@q("q17_geotag_extract", f"""
WITH capt AS (
  SELECT doc_id, substr(text, 1, 40) || ' @ geo:' ||
         printf('%.6f', {_LAT_D}) || ',' || printf('%.6f', {_LON_D}) AS caption
  FROM documents WHERE doc_id % 10 < 9)
SELECT doc_id,
  CAST(regexp_extract(caption, 'geo:(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1) AS DOUBLE) AS lat,
  CAST(regexp_extract(caption, 'geo:(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2) AS DOUBLE) AS lon
FROM capt
""")
def q17(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 < 9)
    lon, lat = point_cols(F.col("doc_id") + 17)
    capt = d.select(
        "doc_id",
        F.concat(F.substring("text", 1, 40), F.lit(" @ geo:"),
                 F.format_string("%.6f", lat), F.lit(","),
                 F.format_string("%.6f", lon)).alias("caption"))
    pat = r"geo:(-?\d+\.\d+),(-?\d+\.\d+)"
    return capt.select(
        "doc_id",
        F.regexp_extract("caption", pat, 1).cast("double").alias("lat"),
        F.regexp_extract("caption", pat, 2).cast("double").alias("lon"))


# =============================================================== training-data ops
# exact dedup: hash-groupBy over normalized text (documents + injected dups)
@q("q18_dedup_exact", """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)
SELECT md5(lower(text)) AS content_hash,
       MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM corpus GROUP BY md5(lower(text))
""")
def q18(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 5 == 0) \
           .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    corpus = d.unionByName(dup)
    return (corpus.groupBy(F.md5(F.col("text").cast("binary")).alias("_h0"))
            .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
            .select(F.col("_h0").alias("content_hash"), "canonical_id", "n_copies"))


# token counting + quality scoring (length / punct / stopword ratios)
@q("q19_text_stats", """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars_m,
       ROUND(CAST(length(text) - length(replace(text, 'a', '')) AS DOUBLE)
             / length(text), 6) AS a_ratio
FROM documents
""")
def q19(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_m"),
        F.round((F.length("text") - F.length(F.replace(F.col("text"), F.lit("a"), F.lit(""))))
                .cast("double") / F.length("text"), 6).alias("a_ratio"))


# language-ID n-gram/marker heuristic (deterministic spec, both engines)
@q("q20_langid", """
SELECT doc_id,
  CASE WHEN de_n > en_n AND de_n > fr_n THEN 'de'
       WHEN fr_n > en_n AND fr_n >= de_n THEN 'fr'
       ELSE 'en' END AS lang_guess
FROM (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\\b(the|a|of)\\b')) AS en_n,
         len(regexp_extract_all(lower(text), '\\b(der|die|das)\\b')) AS de_n,
         len(regexp_extract_all(lower(text), '\\b(le|la|les)\\b')) AS fr_n
  FROM documents)
""")
def q20(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    cnt = lambda pat: F.regexp_count(F.lower(F.col("text")), F.lit(pat))  # noqa: E731
    scored = d.select(
        "doc_id",
        cnt(r"\b(the|a|of)\b").alias("en_n"),
        cnt(r"\b(der|die|das)\b").alias("de_n"),
        cnt(r"\b(le|la|les)\b").alias("fr_n"))
    return scored.select(
        "doc_id",
        F.when((F.col("de_n") > F.col("en_n")) & (F.col("de_n") > F.col("fr_n")), "de")
         .when((F.col("fr_n") > F.col("en_n")) & (F.col("fr_n") >= F.col("de_n")), "fr")
         .otherwise("en").alias("lang_guess"))


# MinHash signatures — portable construction: min over tokens of
# md5(seed || ':' || token); LSH band = md5(h1 || h2)
_MH = {i: f"list_aggregate(list_transform(string_split(lower(text), ' '), "
          f"t -> md5('{i}:' || t)), 'min')" for i in (1, 2, 3, 4)}


@q("q21_minhash_bands", f"""
SELECT doc_id, md5({_MH[1]} || {_MH[2]}) AS band1, md5({_MH[3]} || {_MH[4]}) AS band2
FROM documents
""")
def q21(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ", -1)
    mh = lambda i: F.array_min(F.transform(  # noqa: E731
        toks, lambda t: F.md5(F.concat(F.lit(f"{i}:"), t).cast("binary"))))
    return d.select(
        "doc_id",
        F.md5(F.concat(mh(1), mh(2)).cast("binary")).alias("band1"),
        F.md5(F.concat(mh(3), mh(4)).cast("binary")).alias("band2"))


# embedding cosine similarity — brute-force pairs above threshold
@q("q22_embed_sim", """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
prods AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(CAST(q.embedding[g] AS DOUBLE) * CAST(c.embedding[g] AS DOUBLE)) AS dot,
         SUM(CAST(q.embedding[g] AS DOUBLE) * CAST(q.embedding[g] AS DOUBLE)) AS nq,
         SUM(CAST(c.embedding[g] AS DOUBLE) * CAST(c.embedding[g] AS DOUBLE)) AS nc
  FROM q, embeddings c, generate_series(1, 64) AS gs(g)
  WHERE c.vec_id != q.vec_id
  GROUP BY q.vec_id, c.vec_id)
SELECT query_id, neighbor_id,
       ROUND(dot / (SQRT(nq) * SQRT(nc)), 4) AS cos_sim
FROM prods WHERE dot / (SQRT(nq) * SQRT(nc)) > 0.30
""")
def q22(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    dot = F.aggregate(F.zip_with("qe", "ce", lambda a, b:
                                 a.cast("double") * b.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    pairs = (qv.crossJoin(cv).filter(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("sim", dot / (F.sqrt(norm(F.col("qe"))) * F.sqrt(norm(F.col("ce"))))))
    return (pairs.filter(F.col("sim") > 0.30)
            .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim")))


# event sessionization — lag window + gap rule (streaming-adjacent, batch form)
@q("q23_sessionize", """
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events) GROUP BY user_id
""")
def q23(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(prev.isNull() |
                   ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800), 1).otherwise(0)
    return (ev.withColumn("new_session", new_s)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("new_session").cast("bigint").alias("n_sessions")))
