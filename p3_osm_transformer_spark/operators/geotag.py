"""Geotag extraction from captions — pure Catalyst regexp (no UDF).

North-star step 1: "each record … carries a geotag parsed from its
caption/EXIF via vectorized Arrow UDFs".  A regexp is *more* vectorized
than an Arrow UDF — it runs inside whole-stage codegen — so the caption
path is pure ``regexp_extract``.  (An EXIF binary path would ride the
mapInPandas decode in operators/images.py; captions are the fixture
carrier.)

Pattern: ``@ geo:<lat>,<lon>`` with optional sign/decimals; rows without a
tag yield NULL lat/lon (the dirty-data path — kept, not dropped, so
downstream ops can route them to the no-geo sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEO_RE = r"geo:(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)"


def extract_geotag(df: DataFrame, caption: str = "caption") -> DataFrame:
    lat = F.regexp_extract(F.col(caption), GEO_RE, 1)
    lon = F.regexp_extract(F.col(caption), GEO_RE, 2)
    return (df
            .withColumn("lat", F.when(lat != "", lat.cast("double")))
            .withColumn("lon", F.when(lon != "", lon.cast("double"))))


def geotag_sql(caption: str) -> tuple[str, str]:
    """DuckDB twin (regexp_extract group syntax matches)."""
    lat = f"CAST(NULLIF(regexp_extract({caption}, 'geo:(-?\\d+(?:\\.\\d+)?),(-?\\d+(?:\\.\\d+)?)', 1), '') AS DOUBLE)"
    lon = f"CAST(NULLIF(regexp_extract({caption}, 'geo:(-?\\d+(?:\\.\\d+)?),(-?\\d+(?:\\.\\d+)?)', 2), '') AS DOUBLE)"
    return lat, lon
