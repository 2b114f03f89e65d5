"""Property-based tests (hypothesis) for the pure-numpy kernels — the parts
whose correctness every distributed operator inherits.  No SparkSession:
these run the Arrow-batch kernels directly on adversarial inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_merge_spark import geometry as G
from osm_merge_spark import grid as GR
from osm_merge_spark.sources import tilesinks as TS

coord = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False, width=64)
lat = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False, width=64)
line = st.lists(st.tuples(coord, lat), min_size=2, max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.lists(line, min_size=1, max_size=8))
def test_wkt_round_trip(lines):
    wkt = pd.Series(
        ["LINESTRING(" + ",".join(f"{round(x,7)} {round(y,7)}" for x, y in pts) + ")" for pts in lines]
    )
    kinds, offsets, flat = G.parse_wkt(wkt)
    assert offsets[-1] == sum(len(p) for p in lines)
    back = G.format_wkt(kinds, offsets, flat)
    k2, o2, f2 = G.parse_wkt(back)
    assert (o2 == offsets).all()
    assert np.allclose(f2, flat, atol=1e-7)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20), st.data())
def test_parse_wkt_survives_malformed_rows(counts, data):
    """A malformed (odd-coordinate) row must corrupt only itself — every
    other row keeps its exact coordinates (the per-row trim invariant)."""
    rows, truth = [], []
    for c in counts:
        pts = [(round(data.draw(coord), 6), round(data.draw(lat), 6)) for _ in range(max(c, 2))]
        body = ",".join(f"{x} {y}" for x, y in pts)
        if c % 3 == 0:  # malform: append a dangling number → odd count
            rows.append(f"LINESTRING({body},5.0)")
        else:
            rows.append(f"LINESTRING({body})")
        truth.append(np.array(pts))
    kinds, offsets, flat = G.parse_wkt(pd.Series(rows))
    for i, want in enumerate(truth):
        got = flat[offsets[i] : offsets[i + 1]]
        assert len(got) >= len(want)
        assert np.allclose(got[: len(want)], want, atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=16),
    st.data(),
)
def test_hilbert_bijection_and_locality(z, data):
    n = 1 << z
    xs = np.array([data.draw(st.integers(0, n - 1)) for _ in range(10)], dtype=np.int64)
    ys = np.array([data.draw(st.integers(0, n - 1)) for _ in range(10)], dtype=np.int64)
    tid = TS.pmtiles_tile_id(np.full(10, z), xs, ys)
    base = TS.zoom_base(z)
    assert ((tid >= base) & (tid < base + n * n)).all()
    for i in range(10):
        zz, xx, yy = TS.tile_id_from_pmtiles(int(tid[i]))
        assert (zz, xx, yy) == (z, xs[i], ys[i])


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 26) - 1), st.integers(min_value=0, max_value=(1 << 26) - 1))
def test_morton_round_trip(x, y):
    m = GR.morton_encode(np.array([x], dtype=np.int64), np.array([y], dtype=np.int64))
    xb, yb = GR.morton_decode(m)
    assert (xb[0], yb[0]) == (x, y)


@settings(max_examples=200, deadline=None)
@given(coord, lat, coord, lat)
def test_haversine_metric_properties(lon1, la1, lon2, la2):
    d = float(G.haversine_m(lon1, la1, lon2, la2))
    assert d >= 0
    assert abs(d - float(G.haversine_m(lon2, la2, lon1, la1))) < 1e-6  # symmetry
    if (lon1, la1) == (lon2, la2):
        assert d < 1e-6


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, lat), min_size=3, max_size=20))
def test_convex_hull_contains_all_points(pts):
    P = np.array(pts)
    hull = G.convex_hull_2d(P)
    # every input point is inside or on the hull: cross products vs each edge
    h = np.vstack([hull, hull[:1]])
    for px, py in pts:
        inside = True
        for i in range(len(h) - 1):
            ax, ay = h[i]
            bx, by = h[i + 1]
            if (bx - ax) * (py - ay) - (by - ay) * (px - ax) < -1e-9 * max(1.0, abs(px) + abs(py)):
                inside = False
        assert inside


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, lat), min_size=2, max_size=15), st.floats(0.0, 0.01))
def test_simplify_keeps_endpoints_and_shrinks(pts, tol):
    P = np.array(pts)
    offsets = np.array([0, len(P)], dtype=np.int64)
    o2, f2 = G.simplify_radial(offsets, P, tol_deg=tol)
    kept = f2[o2[0] : o2[1]]
    assert len(kept) <= len(P)
    assert np.allclose(kept[0], P[0]) and np.allclose(kept[-1], P[-1])


@settings(max_examples=100, deadline=None)
@given(st.integers(2, 14), st.data())
def test_cell_zxy_round_trip(z, data):
    n = 1 << z
    x = data.draw(st.integers(0, n - 1))
    y = data.draw(st.integers(0, n - 1))
    cell = GR.cell_from_zxy(np.array([z]), np.array([x]), np.array([y]))
    zz, xx, yy = GR.cell_zxy(cell)
    assert (zz[0], xx[0], yy[0]) == (z, x, y)
