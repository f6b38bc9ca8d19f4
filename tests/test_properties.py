"""Property-based tests (hypothesis) for the pure-numpy/python kernels.

These cover the deterministic math the DataFrame operators delegate to,
without Spark in the loop — fast and wide input coverage.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from p3_osm_transformer_spark.functions.geocell import (
    np_cell_id,
    np_haversine_m,
)
from p3_osm_transformer_spark.functions.s2z import np_s2z_cell
from p3_osm_transformer_spark.functions.tiles import np_tile_id
from p3_osm_transformer_spark.operators.images import (
    decode_bytes,
    encode_pixels,
    psnr,
    synth_pixels,
)
from p3_osm_transformer_spark.operators.pip import np_points_in_polygon
from p3_osm_transformer_spark.sources.rdf import parse_turtle

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@given(lons, lats, st.integers(min_value=1, max_value=20))
def test_cell_id_bounds_and_containment(lon, lat, g):
    n = 2**g
    c = int(np_cell_id(np.array([lon]), np.array([lat]), g)[0])
    assert 0 <= c < n * n
    # the cell's lon/lat box actually contains the point (up to clamping)
    cx, cy = c % n, c // n
    lo_lon = cx / n * 360.0 - 180.0
    lo_lat = cy / n * 180.0 - 90.0
    assert lo_lon - 1e-9 <= lon <= lo_lon + 360.0 / n + 1e-9 or lon == 180.0
    assert lo_lat - 1e-9 <= lat <= lo_lat + 180.0 / n + 1e-9 or lat == 90.0


@given(lons, lats, st.integers(min_value=2, max_value=18))
def test_cell_parent_nesting(lon, lat, g):
    """Child cell at g maps into its parent at g-1 by coordinate halving."""
    child = int(np_cell_id(np.array([lon]), np.array([lat]), g)[0])
    parent = int(np_cell_id(np.array([lon]), np.array([lat]), g - 1)[0])
    n, np_ = 2**g, 2 ** (g - 1)
    assert ((child // n) >> 1) * np_ + ((child % n) >> 1) == parent


@given(lons, lats)
def test_haversine_properties(lon, lat):
    # identity: d(p, p) == 0; symmetry; bounded by half circumference
    assert np_haversine_m(lon, lat, lon, lat) < 1e-6
    d1 = np_haversine_m(lon, lat, 0.0, 0.0)
    d2 = np_haversine_m(0.0, 0.0, lon, lat)
    assert abs(d1 - d2) < 1e-6
    assert d1 <= 20_015_115.0 * 1.001


@given(lons, st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
       st.integers(min_value=1, max_value=20))
def test_tile_id_bounds(lon, lat, z):
    t = int(np_tile_id(np.array([lon]), np.array([lat]), z)[0])
    assert 0 <= t < 4**z


@given(lons, lats)
def test_s2z_roundtrip_locality(lon, lat):
    """Same point at finer level stays within the coarser cell (prefix
    property of Z-order ids at the same face)."""
    c8 = int(np_s2z_cell(np.array([lon]), np.array([lat]), 8)[0])
    c12 = int(np_s2z_cell(np.array([lon]), np.array([lat]), 12)[0])
    assert (c8 >> 58) == (c12 >> 58)                     # same face
    # morton prefix: level-8 bits are the high bits of the level-12 morton
    m8 = (c8 >> 5) & ((1 << 16) - 1) << 0
    m12 = (c12 >> 5) & ((1 << 24) - 1)
    assert (m12 >> 8) == ((c8 >> 5) & ((1 << 16) - 1))


@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.sampled_from([16, 32, 48]), st.sampled_from([16, 32]),
       st.sampled_from(["png", "jpeg"]))
@settings(max_examples=25, deadline=None)
def test_codec_psnr_gate_property(seed, w, h, fmt):
    px = synth_pixels(seed, w, h)
    out = decode_bytes(encode_pixels(px, fmt))
    assert out.shape == px.shape
    if fmt == "png":
        assert np.array_equal(px, out)
    else:
        assert psnr(px, out) >= 40.0


@given(st.floats(min_value=-10, max_value=10, allow_nan=False),
       st.floats(min_value=-10, max_value=10, allow_nan=False))
def test_pip_convex_square(px, py):
    ring = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    got = bool(np_points_in_polygon(np.array([px]), np.array([py]), ring)[0])
    # covers semantics with the operator's 1e-12 boundary tolerance
    eps = 1e-12
    dx = max(0.0 - px, px - 4.0, 0.0)
    dy = max(0.0 - py, py - 4.0, 0.0)
    want = dx <= eps and dy <= eps
    assert got == want


@given(st.lists(st.tuples(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    st.text(alphabet=st.characters(blacklist_characters='"\\',
                                   blacklist_categories=("Cs", "Cc")),
            min_size=0, max_size=20)),
    min_size=1, max_size=8))
def test_turtle_roundtrip(triples):
    doc = "@prefix ex: <http://example.org/> .\n" + "\n".join(
        f'ex:{s} ex:{p} "{o}" .' for s, p, o in triples)
    parsed = parse_turtle(doc)
    want = [(f"http://example.org/{s}", f"http://example.org/{p}", o, True)
            for s, p, o in triples]
    assert parsed == want
