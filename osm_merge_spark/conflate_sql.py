"""ANSI-SQL twin of the full conflation pipeline (DuckDB oracle).

Reproduces, operation for operation, what the engine computes for the
flagship query over the synthetic corpus (sources/synth.py inputs →
operators/conflate.py pipeline), so the driver's DuckDB gate can hash-check
the engine's core operator — not just row counts:

- the corpus arithmetic (``synth.way_geom``/``way_name``/``way_ref``/tags)
  exactly as the Spark Column expressions evaluate it;
- candidate generation as a *brute-force* bbox-overlap join.  The engine's
  cell join (border-epsilon cover + bbox-gap prefilter) is lossless with
  respect to the final ``dist <= threshold`` predicate, so both sides
  converge on the same pair set after the exact filter — the SQL twin checks
  SEMANTICS, not the engine's physical plan;
- the geometry kernel (`geometry.min_dist_pair_m` / `endpoint_slope_angle`)
  with the identical floating-point operation order: equirectangular meters
  at ref_lat = mean of the pair's six vertex latitudes (numpy sums a 6-wide
  row sequentially — left-assoc ``+`` in SQL matches), 12 point→segment
  distances with the same clamped-t formula, proper-intersection → 0;
- scoring (`conflate.score_pairs`): levenshtein name ratio on normalized
  names, ref-number equality, hits, slope/angle thresholds;
- best-match selection with the engine's pinned order
  (hits DESC, dist ASC, way_id ASC) and the tag merge of
  `functions/tags.merge_tags` (OSM wins; ``name`` keeps ext + ``old_name``).

The J3 length-mismatch sentinel (`conflator.py:608-630`) is omitted: the
synthetic 3-vertex ways are all < 1000 m, so |len_a - len_b| > 1000 m is
unsatisfiable on this corpus (max way length ≤ 2 segments × ~485 m).
"""

from __future__ import annotations

from .functions.tags import DEFAULT_ABBREVIATIONS

THRESHOLD_M = 7.0
# join eps (degrees): any pair with true distance <= 7 m has per-axis bbox
# gap <= 7 / (111320 * cos(40.6°)) < 1e-4 — the join is a lossless prefilter
EPS_DEG = 1e-4

_WORDS = [
    "Cedar", "Bear", "Elk", "Aspen", "Granite", "Willow", "Spruce", "Juniper",
    "Mesa", "Canyon", "Ridge", "Summit", "Vista", "Hidden", "Silver", "Copper",
]
_SUFFIX = ["Road", "Creek Road", "Mountain Road", "Lake Road", "Trail", "Spur"]
_ABBREV_SUFFIX = ["Rd", "Cr Rd", "Mtn Rd", "Lk Rd", "Trail", "Spur"]
_HW = ["track", "unclassified", "residential", "tertiary", "path", "footway"]
_REF_RE = r"^\s*([A-Za-z]+)?\s*([0-9][0-9.]*[A-Za-z]?)\s*$"


def _u(key: str, s: int) -> str:
    """synth._u: deterministic uniform in [0,1) (pure int64 arithmetic)."""
    return f"((({key}) * (2654435761 + {s} * 40503) + {s} * 97) % 1000003 / 1000003.0)"


def _pm(expr: str, n: int) -> str:
    """Spark pmod (non-negative) for possibly-negative keys."""
    return f"((({expr}) % {n} + {n}) % {n})"


def _pick(key: str, s: int, options: list[str]) -> str:
    idx = _pm(f"({key}) * 2654435761 + {s} * 97", len(options))
    whens = " ".join(f"WHEN {i} THEN '{o}'" for i, o in enumerate(options))
    return f"(CASE {idx} {whens} END)"


def _name_sql(key: str, abbreviated: bool) -> str:
    sfx = _ABBREV_SUFFIX if abbreviated else _SUFFIX
    return f"{_pick(key, 21, _WORDS)} || ' ' || {_pick(key, 22, sfx)}"


def _ref_sql(key: str, prefix: str) -> str:
    sub = f"CASE WHEN ({key}) % 3 = 0 THEN '.' || CAST(({key}) % 9 + 1 AS VARCHAR) ELSE '' END"
    return f"'{prefix} ' || CAST(({key}) % 900 + 100 AS VARCHAR) || ({sub})"


def _norm_name(col: str) -> str:
    """tags.normalize_name: initcap + space collapse + whole-word
    abbreviation expansion, in the engine's chain order."""
    out = (
        r"array_to_string(list_transform(string_split(regexp_replace(trim("
        + col
        + r"), '\s+', ' ', 'g'), ' '), w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ')"
    )
    for abbr, full in DEFAULT_ABBREVIATIONS.items():
        pat = r"\b" + abbr.replace(".", r"\.") + r"\b"
        out = f"regexp_replace({out}, '{pat}', '{full}', 'g')"
    return out


def _geom_parts(key: str) -> dict[str, str]:
    """synth.way_geom(key, n_pts=3) building blocks (lon/lat anchor + the two
    segment deltas), matching the Column-expression evaluation order."""
    hot = f"({key}) % 100 = 7"
    scale = f"(CASE WHEN {hot} THEN 0.05 ELSE 1.0 END)"
    return {
        "lon": f"CASE WHEN {hot} THEN -106.5 + {_u(key, 11)} * 0.01 ELSE -109.0 + {_u(key, 1)} * 5.0 END",
        "lat": f"CASE WHEN {hot} THEN 39.0 + {_u(key, 12)} * 0.01 ELSE 37.0 + {_u(key, 2)} * 3.5 END",
        "dx1": f"({_u(key, 3)} - 0.5) * 0.008 * {scale}",
        "dy1": f"({_u(key, 4)} - 0.5) * 0.006 * {scale}",
        "dx2": f"({_u(key, 5)} - 0.5) * 0.008 * {scale}",
        "dy2": f"({_u(key, 6)} - 0.5) * 0.006 * {scale}",
    }


def _point_seg(tname: str, px: str, py: str, ax: str, ay: str, ux: str, uy: str, den: str) -> tuple[str, str]:
    """(t-column expr, d2 expr using the named t column) — the clamped-t
    point→segment squared distance of `geometry._point_seg_dist2`."""
    apx, apy = f"({px} - {ax})", f"({py} - {ay})"
    t = (
        f"least(greatest(CASE WHEN {den} > 0 THEN ({apx} * {ux} + {apy} * {uy}) / {den} "
        f"ELSE 0.0 END, 0.0), 1.0)"
    )
    dx = f"({apx} - {tname} * {ux})"
    dy = f"({apy} - {tname} * {uy})"
    return t, f"({dx} * {dx} + {dy} * {dy})"


def _orient(ox: str, oy: str, px: str, py: str, qx: str, qy: str) -> str:
    return f"(({px} - {ox}) * ({qy} - {oy}) - ({py} - {oy}) * ({qx} - {ox}))"


def _pipeline_ctes() -> str:
    """Shared WITH-clause body: corpus → pairs → kernel → scored rows."""
    w = _geom_parts("k")
    n = _geom_parts("m")
    nn_name = _norm_name("name")
    rn_ref = f"upper(regexp_extract(ref, '{_REF_RE}', 2))"

    # --- the 12 point→segment distances + 4 intersection tests -------------
    # A = ext vertices (ax0..ay2) / segments (va*); B = osm (bx0.., vb*)
    tcols, d2cols = [], []
    for i in range(3):  # ext vertex i vs osm segment j
        for j in (1, 2):
            a0x, a0y = f"bx{j-1}", f"by{j-1}"
            t, d2 = _point_seg(f"t_eb_{i}{j}", f"ax{i}", f"ay{i}", a0x, a0y, f"vbx{j}", f"vby{j}", f"db{j}")
            tcols.append(f"{t} AS t_eb_{i}{j}")
            d2cols.append(f"{d2} AS d2_eb_{i}{j}")
    for i in range(3):  # osm vertex i vs ext segment j
        for j in (1, 2):
            a0x, a0y = f"ax{j-1}", f"ay{j-1}"
            t, d2 = _point_seg(f"t_be_{i}{j}", f"bx{i}", f"by{i}", a0x, a0y, f"vax{j}", f"vay{j}", f"da{j}")
            tcols.append(f"{t} AS t_be_{i}{j}")
            d2cols.append(f"{d2} AS d2_be_{i}{j}")
    inters = []
    for i in (1, 2):  # ext segment i vs osm segment j, meters
        for j in (1, 2):
            p1 = (f"ax{i-1}", f"ay{i-1}")
            p2 = (f"ax{i}", f"ay{i}")
            p3 = (f"bx{j-1}", f"by{j-1}")
            p4 = (f"bx{j}", f"by{j}")
            o1 = _orient(*p1, *p2, *p3)
            o2 = _orient(*p1, *p2, *p4)
            o3 = _orient(*p3, *p4, *p1)
            o4 = _orient(*p3, *p4, *p2)
            inters.append(f"({o1} * {o2} < 0 AND {o3} * {o4} < 0)")
    min_d2 = "least(" + ", ".join(f"d2_eb_{i}{j}" for i in range(3) for j in (1, 2)) + ", " + \
        ", ".join(f"d2_be_{i}{j}" for i in range(3) for j in (1, 2)) + ")"

    return f"""
o AS (SELECT o_orderkey AS k FROM orders),
wb AS (
  SELECT k, {w['lon']} AS lon, {w['lat']} AS lat,
         {w['dx1']} AS dx1, {w['dy1']} AS dy1, {w['dx2']} AS dx2, {w['dy2']} AS dy2
  FROM o
),
wpts AS (
  SELECT k AS way_id,
         lon AS x0, lat AS y0, lon + dx1 AS x1, lat + dy1 AS y1,
         lon + dx1 + dx2 AS x2, lat + dy1 + dy2 AS y2,
         {_pick('k', 23, _HW)} AS hw,
         {_name_sql('k', False)} AS name,
         {_ref_sql('k', 'FR')} AS ref,
         CAST(k % 5 + 1 AS INT) AS ver
  FROM wb
),
osm AS MATERIALIZED (
  SELECT *, {nn_name} AS nn, {rn_ref} AS rn,
         least(x0, x1, x2) AS minx, greatest(x0, x1, x2) AS maxx,
         least(y0, y1, y2) AS miny, greatest(y0, y1, y2) AS maxy
  FROM wpts
),
etw AS (
  SELECT eb.ext_id,
         wb.lon AS x0, (wb.lat + eb.j) AS y0,
         wb.lon + wb.dx1 AS x1, (wb.lat + eb.j) + wb.dy1 AS y1,
         wb.lon + wb.dx1 + wb.dx2 AS x2, ((wb.lat + eb.j) + wb.dy1) + wb.dy2 AS y2,
         {_name_sql('eb.k', True)} AS name,
         {_ref_sql('eb.k', 'FS')} AS ref
  FROM (
    SELECT k, -k AS ext_id,
           (CASE WHEN k % 10 = 8 THEN 12.0 + {_u('k', 31)} * 6.0
                 ELSE {_u('k', 31)} * 6.0 END) / 110540.0 AS j
    FROM o WHERE k % 10 <> 3
  ) eb JOIN wb ON wb.k = eb.k
),
nb AS (
  SELECT -(k + 1000000000) AS ext_id, (k * 13 + 5) % 40000000 AS m
  FROM o WHERE k % 9 = 4
),
nwb AS (
  SELECT ext_id, m, {n['lon']} AS lon, {n['lat']} AS lat,
         {n['dx1']} AS dx1, {n['dy1']} AS dy1, {n['dx2']} AS dx2, {n['dy2']} AS dy2
  FROM nb
),
env AS (
  SELECT ext_id,
         lon AS x0, lat AS y0, lon + dx1 AS x1, lat + dy1 AS y1,
         lon + dx1 + dx2 AS x2, lat + dy1 + dy2 AS y2,
         {_name_sql('m', False)} AS name,
         {_ref_sql('m', 'CR')} AS ref
  FROM nwb
),
ext AS MATERIALIZED (
  SELECT *, {nn_name} AS nn, {rn_ref} AS rn,
         {_pick('ext_id', 41, ['dirt', 'gravel', 'paved'])} AS surface,
         {_pick('ext_id', 42, ['yes', 'no'])} AS seasonal,
         least(x0, x1, x2) AS minx, greatest(x0, x1, x2) AS maxx,
         least(y0, y1, y2) AS miny, greatest(y0, y1, y2) AS maxy
  FROM (SELECT * FROM etw UNION ALL SELECT * FROM env)
),
prs AS (
  SELECT e.ext_id, w.way_id,
         e.x0 AS ex0, e.y0 AS ey0, e.x1 AS ex1, e.y1 AS ey1, e.x2 AS ex2, e.y2 AS ey2,
         w.x0 AS wx0, w.y0 AS wy0, w.x1 AS wx1, w.y1 AS wy1, w.x2 AS wx2, w.y2 AS wy2,
         e.name AS ename, e.nn AS enn, e.rn AS ern, e.ref AS eref,
         e.surface, e.seasonal,
         w.name AS wname, w.nn AS wnn, w.rn AS wrn, w.ref AS wref, w.hw, w.ver
  FROM ext e JOIN osm w
    ON e.minx <= w.maxx + {EPS_DEG} AND e.maxx >= w.minx - {EPS_DEG}
   AND e.miny <= w.maxy + {EPS_DEG} AND e.maxy >= w.miny - {EPS_DEG}
),
m1 AS (SELECT *, (ey0 + ey1 + ey2 + wy0 + wy1 + wy2) / 6.0 AS refl FROM prs),
m2 AS (SELECT *, 111320.0 * cos(radians(refl)) AS sx FROM m1),
m3 AS (
  SELECT *,
         ex0 * sx AS ax0, ey0 * 110540.0 AS ay0, ex1 * sx AS ax1, ey1 * 110540.0 AS ay1,
         ex2 * sx AS ax2, ey2 * 110540.0 AS ay2,
         wx0 * sx AS bx0, wy0 * 110540.0 AS by0, wx1 * sx AS bx1, wy1 * 110540.0 AS by1,
         wx2 * sx AS bx2, wy2 * 110540.0 AS by2
  FROM m2
),
m4 AS (
  SELECT *,
         ax1 - ax0 AS vax1, ay1 - ay0 AS vay1, ax2 - ax1 AS vax2, ay2 - ay1 AS vay2,
         bx1 - bx0 AS vbx1, by1 - by0 AS vby1, bx2 - bx1 AS vbx2, by2 - by1 AS vby2
  FROM m3
),
m5 AS (
  SELECT *,
         vax1 * vax1 + vay1 * vay1 AS da1, vax2 * vax2 + vay2 * vay2 AS da2,
         vbx1 * vbx1 + vby1 * vby1 AS db1, vbx2 * vbx2 + vby2 * vby2 AS db2
  FROM m4
),
m6 AS (SELECT *, {', '.join(tcols)} FROM m5),
m7 AS (SELECT *, {', '.join(d2cols)} FROM m6),
m8 AS (
  SELECT *, CASE WHEN {' OR '.join(inters)} THEN 0.0 ELSE sqrt({min_d2}) END AS dist
  FROM m7
),
sl AS (
  SELECT *,
         CASE WHEN ex2 - ex0 = 0 THEN 0.0 ELSE (ey2 - ey0) / (ex2 - ex0) END AS s1,
         CASE WHEN wx2 - wx0 = 0 THEN 0.0 ELSE (wy2 - wy0) / (wx2 - wx0) END AS s2
  FROM m8
),
sc AS (
  SELECT *,
         abs(s2 - s1) AS dslope,
         CASE WHEN 1.0 + s2 * s1 = 0
              THEN (CASE WHEN s2 - s1 = 0 THEN 0.0 ELSE 90.0 END)
              ELSE abs(degrees(atan((s2 - s1) / (1.0 + s2 * s1)))) END AS angle,
         round(CASE WHEN greatest(length(enn), length(wnn)) = 0 THEN 100.0
                    ELSE 100.0 * (1.0 - CAST(levenshtein(lower(enn), lower(wnn)) AS DOUBLE)
                                  / greatest(length(enn), length(wnn))) END, 4) AS name_ratio,
         CASE WHEN ern = wrn AND ern <> '' THEN 100.0 ELSE 0.0 END AS ref_ratio
  FROM sl
),
ok AS (
  SELECT *,
         1 + (CASE WHEN name_ratio >= 80.0 THEN 1 ELSE 0 END)
           + (CASE WHEN ref_ratio >= 80.0 THEN 1 ELSE 0 END) AS hits
  FROM sc
  WHERE dist >= 0 AND dist <= {THRESHOLD_M} AND angle <= 17.0 AND dslope <= 4.0
)"""


_TAG_SIG_CONFLATED = (
    "'highway=' || hw || '|name=' || ename || "
    "(CASE WHEN ename <> wname THEN '|old_name=' || wname ELSE '' END) || "
    "'|ref:usfs=' || wref || '|seasonal=' || seasonal || '|surface=' || surface"
)

CONFLATE_FLAGSHIP_SQL = f"""
WITH {_pipeline_ctes()},
best AS (
  SELECT *, row_number() OVER (PARTITION BY ext_id ORDER BY hits DESC, dist ASC, way_id ASC) AS rnk
  FROM ok
)
SELECT ext_id, way_id, hits,
       round(dist, 2) AS dist,
       round(name_ratio, 1) AS name_ratio,
       ref_ratio,
       round(dslope, 4) AS dslope,
       round(angle, 4) AS angle,
       ver + 1 AS version,
       {_TAG_SIG_CONFLATED} AS tag_sig
FROM best WHERE rnk = 1
ORDER BY ext_id
"""

CONFLATE_NEW_SQL = f"""
WITH {_pipeline_ctes()},
matched AS (SELECT DISTINCT ext_id FROM ok)
SELECT ext_id, 1 AS version,
       'fixme=New features merged from an external dataset|highway=track|informal=yes|name='
         || name || '|ref:usfs=' || ref || '|seasonal=' || seasonal || '|surface=' || surface AS tag_sig
FROM ext
WHERE ext_id NOT IN (SELECT ext_id FROM matched)
ORDER BY ext_id
"""


def osm_geom_ctes(n_pts: int = 3) -> str:
    """CTE fragment: ``o`` + ``wgeo(way_id, x0..y{n-1})`` — the synthetic osm
    way geometry (synth.way_geom) for any vertex count, evaluation-order
    exact."""
    u = _u
    dxs = [f"({u('k', 3 + 2 * i)} - 0.5) * 0.008 * (CASE WHEN k % 100 = 7 THEN 0.05 ELSE 1.0 END)" for i in range(n_pts - 1)]
    dys = [f"({u('k', 4 + 2 * i)} - 0.5) * 0.006 * (CASE WHEN k % 100 = 7 THEN 0.05 ELSE 1.0 END)" for i in range(n_pts - 1)]
    w = _geom_parts("k")
    delta_cols = ", ".join(
        [f"{d} AS dx{i + 1}" for i, d in enumerate(dxs)] + [f"{d} AS dy{i + 1}" for i, d in enumerate(dys)]
    )
    pts = ["lon AS x0", "lat AS y0"]
    for i in range(1, n_pts):
        xs = " + ".join(["lon"] + [f"dx{j}" for j in range(1, i + 1)])
        ys = " + ".join(["lat"] + [f"dy{j}" for j in range(1, i + 1)])
        pts.append(f"{xs} AS x{i}")
        pts.append(f"{ys} AS y{i}")
    return f"""o AS (SELECT o_orderkey AS k FROM orders),
wb AS (SELECT k, {w['lon']} AS lon, {w['lat']} AS lat, {delta_cols} FROM o),
wgeo AS (SELECT k AS way_id, {', '.join(pts)} FROM wb)"""


def line_tiles_sql(min_lon: float, min_lat: float, dlon: float, dlat: float, nx: int, ny: int) -> str:
    """DuckDB twin of `tiling.line_tiles_kernel` over the 3-vertex synthetic
    ways: quarter-tile segment sampling (frac = j/steps, identical fp) →
    floor grid routing, clipped to [0,nx)×[0,ny)."""
    qlon, qlat = repr(dlon / 4.0), repr(dlat / 4.0)
    return f"""
WITH {osm_geom_ctes(3)},
segs AS (
  SELECT way_id, x0 AS sax, y0 AS say, x1 AS sbx, y1 AS sby FROM wgeo
  UNION ALL
  SELECT way_id, x1, y1, x2, y2 FROM wgeo
),
st AS (
  SELECT *, greatest(CAST(ceil(greatest(abs(sbx - sax) / {qlon}, abs(sby - say) / {qlat})) AS BIGINT), 1) AS steps
  FROM segs
),
samp AS (SELECT *, unnest(generate_series(0, steps)) AS jj FROM st),
pts AS (
  SELECT way_id,
         sax + (sbx - sax) * (CAST(jj AS DOUBLE) / steps) AS px,
         say + (sby - say) * (CAST(jj AS DOUBLE) / steps) AS py
  FROM samp
),
tt AS (
  SELECT DISTINCT way_id,
         CAST(floor((px - ({repr(min_lon)})) / {repr(dlon)}) AS BIGINT) AS tx,
         CAST(floor((py - ({repr(min_lat)})) / {repr(dlat)}) AS BIGINT) AS ty
  FROM pts
)
SELECT way_id, 'Task_' || CAST(tx * {ny} + ty AS VARCHAR) AS tile_id
FROM tt WHERE tx >= 0 AND ty >= 0 AND tx < {nx} AND ty < {ny}
ORDER BY way_id, tile_id
"""


def simplify_sql(n_pts: int = 8, tol: float = 1e-3) -> str:
    """DuckDB twin of `geometry.simplify_radial` over the n-vertex synthetic
    ways: the sequential keep-if-far-from-last-kept scan unrolled as one CTE
    layer per vertex (endpoints always kept)."""
    layers = []
    prev = "s0"
    layers.append(f"s0 AS (SELECT *, x0 AS lx, y0 AS ly, 1 AS cnt FROM wgeo)")
    for p in range(1, n_pts):
        is_last = "TRUE" if p == n_pts - 1 else "FALSE"
        layers.append(
            f"""s{p} AS (
  SELECT * EXCLUDE (lx, ly, cnt, kp),
         CASE WHEN kp THEN x{p} ELSE lx END AS lx,
         CASE WHEN kp THEN y{p} ELSE ly END AS ly,
         cnt + (CASE WHEN kp THEN 1 ELSE 0 END) AS cnt
  FROM (
    SELECT *, (sqrt((x{p} - lx) * (x{p} - lx) + (y{p} - ly) * (y{p} - ly)) >= {repr(tol)} OR {is_last}) AS kp
    FROM {prev}
  )
)"""
        )
        prev = f"s{p}"
    return f"""
WITH {osm_geom_ctes(n_pts)},
{', '.join(layers)}
SELECT way_id, CAST(cnt AS DOUBLE) AS n_after, CAST({n_pts} AS DOUBLE) AS n_pts
FROM {prev} ORDER BY way_id
"""
