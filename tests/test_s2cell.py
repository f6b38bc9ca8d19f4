"""True-S2 cell id validation.

No libs2 binding exists in this sandbox, so correctness is pinned three
independent ways:

1. a second, structurally different implementation of the published
   algorithm below (`_s2_cellid_walk`): per-level orientation walk over
   all 30 levels with the 4-entry IJ→pos table — no 4-bit lookup
   tables, no vectorization.  It shares only the published spec
   constants with the module under test.
2. hand-derivable anchors: the six level-0 face cells are
   face·2^61 + 2^60 exactly (spec: 3 face bits then the trailing bit
   at position 60).
3. structural invariants: trailing-bit encoding, parent containment via
   range_min/range_max, level round-trip, hierarchy monotonicity.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from p3_osm_transformer_spark.functions import s2cell
from p3_osm_transformer_spark.functions.s2cell import (
    IJ_TO_POS, MAX_LEVEL, POS_TO_ORIENTATION, SWAP_MASK,
    np_ij_from_lonlat, np_s2_cellid, np_s2_level, np_s2_parent,
)


def _s2_cellid_walk(lon: float, lat: float, level: int = MAX_LEVEL) -> int:
    """Independent scalar implementation: leaf (face,i,j) from the shared
    projection helpers, then the Hilbert position one level at a time."""
    face_a, i_a, j_a = np_ij_from_lonlat(np.array([lon]), np.array([lat]))
    face, i, j = int(face_a[0]), int(i_a[0]), int(j_a[0])
    orientation = face & SWAP_MASK
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = IJ_TO_POS[orientation][ij]
        pos = pos * 4 + p
        orientation ^= POS_TO_ORIENTATION[p]
    leaf = (face << 61) | (pos << 1) | 1
    if level < MAX_LEVEL:
        lsb = 1 << (2 * (MAX_LEVEL - level))
        leaf = (leaf & ~(lsb - 1)) | lsb
    # reinterpret as signed 64-bit (faces 4-5 set bit 63)
    return leaf - (1 << 64) if leaf >= (1 << 63) else leaf


def test_face_cells_are_spec_constants():
    # face centers at level 0: id = face * 2^61 + 2^60 (unsigned)
    pts = [(0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 90.0, 2),
           (180.0, 0.0, 3), (-90.0, 0.0, 4), (0.0, -90.0, 5)]
    for lon, lat, face in pts:
        got = int(np_s2_cellid(np.array([lon]), np.array([lat]), 0)[0])
        want = face * (1 << 61) + (1 << 60)
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert got == want, (lon, lat, face, hex(got & (2**64 - 1)))


@given(st.floats(-179.99, 179.99), st.floats(-89.99, 89.99),
       st.integers(0, MAX_LEVEL))
@settings(max_examples=200, deadline=None)
def test_lookup_matches_independent_walk(lon, lat, level):
    fast = int(np_s2_cellid(np.array([lon]), np.array([lat]), level)[0])
    assert fast == _s2_cellid_walk(lon, lat, level)


def test_vectorized_batch_matches_scalar_walk():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    ids = np_s2_cellid(lon, lat, MAX_LEVEL)
    for k in range(0, 500, 37):
        assert int(ids[k]) == _s2_cellid_walk(float(lon[k]), float(lat[k]))


def test_level_and_parent_roundtrip():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    for level in (0, 1, 7, 12, 29, 30):
        ids = np_s2_cellid(lon, lat, level)
        assert (np_s2_level(ids) == level).all()
        # trailing structure: exactly one low set bit at 2*(30-level)
        u = ids.view(np.uint64)
        lsb = u & (~u + np.uint64(1))
        assert (lsb == np.uint64(1) << np.uint64(2 * (30 - level))).all()
    leaf = np_s2_cellid(lon, lat, MAX_LEVEL)
    for level in (3, 10, 18):
        par = np_s2_parent(leaf, level)
        direct = np_s2_cellid(lon, lat, level)
        assert (par == direct).all()


def test_parent_contains_child_range():
    rng = np.random.default_rng(13)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    leaf = np_s2_cellid(lon, lat, MAX_LEVEL).view(np.uint64)
    par = np_s2_parent(leaf.view(np.int64), 9).view(np.uint64)
    lsb = par & (~par + np.uint64(1))
    lo, hi = par - (lsb - np.uint64(1)), par + (lsb - np.uint64(1))
    assert ((leaf >= lo) & (leaf <= hi)).all()


def test_locality_nearby_points_share_coarse_parent():
    a = np_s2_cellid(np.array([11.5]), np.array([48.1]), 10)
    b = np_s2_cellid(np.array([11.5001]), np.array([48.1001]), 10)
    pa = np_s2_parent(a, 7)
    pb = np_s2_parent(b, 7)
    assert int(pa[0]) == int(pb[0])


def test_hilbert_adjacency_within_face():
    """Consecutive Hilbert positions at a level are edge-adjacent cells
    — the property Morton ordering lacks and the reason the spec uses
    the Hilbert curve.  Verified by decoding positions back to (i,j)
    with the inverse walk."""
    def ij_of(pos: int, face: int, level: int):
        orientation = face & SWAP_MASK
        i = j = 0
        for k in range(level):
            p = (pos >> (2 * (level - 1 - k))) & 3
            ij = s2cell.POS_TO_IJ[orientation][p]
            i = (i << 1) | (ij >> 1)
            j = (j << 1) | (ij & 1)
            orientation ^= POS_TO_ORIENTATION[p]
        return i, j
    level = 6
    for pos in range(0, (1 << (2 * level)) - 1):
        i0, j0 = ij_of(pos, 0, level)
        i1, j1 = ij_of(pos + 1, 0, level)
        assert abs(i0 - i1) + abs(j0 - j1) == 1, pos


def test_spark_column_and_catalyst_algebra(spark):
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(1, 11.57, 48.13), (2, -73.98, 40.75), (3, 139.69, 35.68),
         (4, 151.21, -33.86), (5, -58.38, -34.60)],
        "id long, lon double, lat double")
    out = (df.select(
        "id", "lon", "lat",
        s2cell.s2_cellid(F.col("lon"), F.col("lat"), 12).alias("cell"))
        .withColumn("lvl", s2cell.s2_level(F.col("cell")))
        .withColumn("par", s2cell.s2_parent(F.col("cell"), 7))
        .withColumn("face", s2cell.s2_face(F.col("cell")))
        .withColumn("lo", s2cell.s2_range_min(F.col("par")))
        .withColumn("hi", s2cell.s2_range_max(F.col("par"))))
    rows = {r["id"]: r for r in out.collect()}
    for rid, r in rows.items():
        want = _s2_cellid_walk(r["lon"], r["lat"], 12)
        assert r["cell"] == want
        assert r["lvl"] == 12
        assert r["par"] == _s2_cellid_walk(r["lon"], r["lat"], 7)
        assert r["face"] == int(np.int64(r["cell"]).view(np.uint64)) >> 61
        # catalyst range algebra equals the numpy algebra
        u = int(np.int64(r["par"]).view(np.uint64))
        lsb = u & -u
        assert int(np.int64(r["lo"]).view(np.uint64)) == u - (lsb - 1)
        assert int(np.int64(r["hi"]).view(np.uint64)) == u + (lsb - 1)
        # covering-join invariant: the child falls in the parent's range;
        # signed compare is valid here because parent and child share the
        # face (bit 63 equal → signed order == unsigned order)
        assert r["lo"] <= r["cell"] <= r["hi"]
