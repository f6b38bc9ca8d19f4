"""EXIF GPS geotag: byte-level parser + Arrow-batched Spark operator."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.exif import (
    build_jpeg_with_exif_gps, extract_exif_geotag, geotag_caption_or_exif,
    parse_exif_gps)


def test_roundtrip_both_byte_orders():
    for le in (True, False):
        b = build_jpeg_with_exif_gps(42.3600902, 10.9195731, little_endian=le)
        lat, lon = parse_exif_gps(b)
        assert lat == pytest.approx(42.3600902, abs=1e-6)
        assert lon == pytest.approx(10.9195731, abs=1e-6)


def test_southern_western_hemispheres():
    lat, lon = parse_exif_gps(build_jpeg_with_exif_gps(-33.8688, -70.6693))
    assert lat == pytest.approx(-33.8688, abs=1e-6)
    assert lon == pytest.approx(-70.6693, abs=1e-6)


@settings(max_examples=60, deadline=None)
@given(lat=st.floats(-89.999, 89.999), lon=st.floats(-179.999, 179.999),
       le=st.booleans())
def test_roundtrip_property(lat, lon, le):
    got = parse_exif_gps(build_jpeg_with_exif_gps(lat, lon, le))
    assert got[0] == pytest.approx(lat, abs=1e-6)
    assert got[1] == pytest.approx(lon, abs=1e-6)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_garbage_never_raises(b):
    lat, lon = parse_exif_gps(b)
    assert lat is None and lon is None


def test_truncated_valid_prefix_never_raises():
    b = build_jpeg_with_exif_gps(1.0, 2.0)
    for cut in range(len(b)):
        lat, lon = parse_exif_gps(b[:cut])
        # a cut that keeps the whole APP1 segment (only EOI lost) still
        # parses; any deeper cut must yield clean NULLs — never garbage
        assert (lat, lon) == (None, None) or (
            lat == pytest.approx(1.0, abs=1e-6)
            and lon == pytest.approx(2.0, abs=1e-6))


def test_spark_operator_and_caption_fallback(spark):
    rows = [
        ("cap", "photo @ geo:42.3600902,10.9195731",
         build_jpeg_with_exif_gps(-1.0, -2.0)),       # caption wins
        ("exif", "no tag here", build_jpeg_with_exif_gps(48.8584, 2.2945)),
        ("none", "no tag here", b"\xff\xd8\xff\xd9"),  # no gps at all
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string, bytes binary")

    got = {r.image_id: (r.exif_lat, r.exif_lon)
           for r in extract_exif_geotag(df).collect()}
    assert got["exif"][0] == pytest.approx(48.8584, abs=1e-6)
    assert got["none"] == (None, None)

    merged = {r.image_id: (r.lat, r.lon)
              for r in geotag_caption_or_exif(df).collect()}
    assert merged["cap"][0] == pytest.approx(42.3600902)   # caption, not EXIF
    assert merged["exif"][1] == pytest.approx(2.2945, abs=1e-6)
    assert merged["none"] == (None, None)                  # dirty-data kept
