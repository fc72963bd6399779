"""Geospatial primitives over GeoJSON-string geometry columns.

The readers (`sources/readers.py`, mirroring the reference's
readers/geojson.rs) keep geometry as a GeoJSON string column; the
reference's housing_prices notebook then runs `st_geomfromgeojson` /
`st_intersects` / `st_asgeojson` on a Spark-Sedona kernel. This module
provides the Spark-first equivalents used by the ported example
(`examples/housing_prices`) without a native geometry engine:

- parsing and centroid/bbox extraction are vectorized Arrow passes
  (one `pandas_udf` per column — narrow, shuffle-free);
- point-in-polygon classification broadcasts the SMALL polygon side
  (admin boundaries: thousands of rows, KBs-MBs) as a closure
  constant and ray-casts each point against bbox-prefiltered
  candidates — the big side streams through one narrow pipeline, the
  standard shape for 100 TB point sets vs small boundary tables;
- for big-big spatial joins, `bbox_grid_cells` assigns geometries to
  fixed grid cells so candidates co-locate under one equi-join
  shuffle (the classic grid-partitioned spatial join); exact
  refinement then runs per candidate pair.

All kernels are pure numpy/python over parsed coordinates; GeoJSON
Polygon / MultiPolygon rings are supported (holes included for
containment).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType, StringType


def _rings(geom: dict | None) -> list[np.ndarray]:
    """Exterior+hole rings of a Polygon/MultiPolygon as (n,2) arrays."""
    if not geom:
        return []
    t = geom.get("type")
    if t == "Polygon":
        polys = [geom["coordinates"]]
    elif t == "MultiPolygon":
        polys = geom["coordinates"]
    elif t == "Point":
        return [np.asarray([geom["coordinates"]], dtype=np.float64)]
    elif t == "LineString":
        return [np.asarray(geom["coordinates"], dtype=np.float64)]
    else:
        return []
    out = []
    for rings in polys:
        for ring in rings:
            out.append(np.asarray(ring, dtype=np.float64))
    return out


def _poly_centroid(geom: dict | None) -> tuple[float, float] | None:
    """Area-weighted centroid (shoelace). The first ring of each
    polygon is the shell; subsequent rings are holes and SUBTRACT,
    normalized by |area| regardless of winding — real-world GeoJSON
    routinely violates RFC 7946 ring orientation, and a same-winding
    hole must still pull the centroid away from itself, matching
    st_centroid. Points/LineStrings and zero-area geometries fall back
    to the vertex mean."""
    if not geom:
        return None
    t = geom.get("type")
    if t == "Polygon":
        polys = [geom["coordinates"]]
    elif t == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        rings = _rings(geom)
        if not rings:
            return None
        pts = np.vstack(rings)
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    a_sum = cx = cy = 0.0
    for rings in polys:
        for ri, ring in enumerate(rings):
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 3:
                continue
            x, y = r[:, 0], r[:, 1]
            x2, y2 = np.roll(x, -1), np.roll(y, -1)
            cross = x * y2 - x2 * y
            a = cross.sum() / 2.0
            if a == 0.0:
                continue
            cxr = ((x + x2) * cross).sum() / 6.0
            cyr = ((y + y2) * cross).sum() / 6.0
            sign = 1.0 if a > 0 else -1.0  # normalize to +orientation
            a, cxr, cyr = a * sign, cxr * sign, cyr * sign
            if ri > 0:  # hole: subtract, whatever its winding
                a, cxr, cyr = -a, -cxr, -cyr
            a_sum += a
            cx += cxr
            cy += cyr
    if a_sum == 0.0:
        rings = _rings(geom)
        pts = np.vstack(rings)
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return cx / a_sum, cy / a_sum


def geom_centroid(col: Column) -> Column:
    """[x, y] centroid of a GeoJSON geometry string — one Arrow pass."""

    @pandas_udf(ArrayType(DoubleType()))
    def _centroid(s: pd.Series) -> pd.Series:
        out = []
        for g in s:
            c = _poly_centroid(json.loads(g) if g else None)
            out.append(list(c) if c else None)
        return pd.Series(out, dtype=object)

    return _centroid(col)


def geom_bbox(col: Column) -> Column:
    """[minx, miny, maxx, maxy] of a GeoJSON geometry string."""

    @pandas_udf(ArrayType(DoubleType()))
    def _bbox(s: pd.Series) -> pd.Series:
        out = []
        for g in s:
            rings = _rings(json.loads(g) if g else None)
            if not rings:
                out.append(None)
                continue
            pts = np.vstack(rings)
            out.append(
                [
                    float(pts[:, 0].min()),
                    float(pts[:, 1].min()),
                    float(pts[:, 0].max()),
                    float(pts[:, 1].max()),
                ]
            )
        return pd.Series(out, dtype=object)

    return _bbox(col)


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Ray casting (even-odd rule), vectorized over the ring's edges."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    straddles = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.count_nonzero(straddles & (px < xs)) % 2)


def _point_in_geom(px: float, py: float, geom: dict) -> bool:
    """Even-odd over ALL rings: a point inside a hole ring flips back
    out — matching st_contains for polygons with holes."""
    t = geom.get("type")
    if t == "Polygon":
        polys = [geom["coordinates"]]
    elif t == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        return False
    for rings in polys:
        inside = False
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) >= 3 and _point_in_ring(px, py, r):
                inside = not inside
        if inside:
            return True
    return False


def point_in_polygon_tag(
    points_xy: Column,
    polygons: list[tuple[Any, str]],
) -> Column:
    """Tag each [x, y] point with the key of the FIRST polygon (in list
    order) containing it, else null.

    `polygons` is a driver-side list of (key, geojson_string) — the
    SMALL side (admin boundaries), shipped to executors as a broadcast
    closure constant. Candidates are bbox-prefiltered, then exactly
    ray-cast. The point side streams through one narrow Arrow pass: no
    shuffle, no join — the scalable shape when one side is boundary-
    table-sized. For big-big cases use :func:`bbox_grid_cells` + an
    equi-join on the cell id instead.
    """
    parsed = []
    for key, gs in polygons:
        geom = json.loads(gs)
        rings = _rings(geom)
        if not rings:
            continue
        pts = np.vstack(rings)
        bbox = (
            pts[:, 0].min(),
            pts[:, 1].min(),
            pts[:, 0].max(),
            pts[:, 1].max(),
        )
        parsed.append((key, bbox, geom))

    @pandas_udf(StringType())
    def _tag(s: pd.Series) -> pd.Series:
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            px, py = float(p[0]), float(p[1])
            hit = None
            for key, (x0, y0, x1, y1), geom in parsed:
                if px < x0 or px > x1 or py < y0 or py > y1:
                    continue
                if _point_in_geom(px, py, geom):
                    hit = str(key)
                    break
            out.append(hit)
        return pd.Series(out, dtype=object)

    return _tag(points_xy)


def bbox_grid_cells(bbox_col: Column, cell_size: float) -> Column:
    """All grid-cell ids a bbox touches (cell = floor(coord/size) pair,
    packed into one long). Exploding this column and equi-joining on
    the cell id co-locates candidate pairs under ONE shuffle — the
    grid-partitioned spatial join for big-big workloads; refine exact
    predicates per candidate afterwards. `cell_size` should be chosen
    so a typical geometry touches O(1) cells."""

    @pandas_udf(ArrayType(LongType()))
    def _cells(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            if b is None:
                out.append(None)
                continue
            x0, y0, x1, y1 = (float(v) for v in b)
            cx0, cx1 = int(np.floor(x0 / cell_size)), int(np.floor(x1 / cell_size))
            cy0, cy1 = int(np.floor(y0 / cell_size)), int(np.floor(y1 / cell_size))
            cells = [
                (cx << 32) | (cy & 0xFFFFFFFF)
                for cx in range(cx0, cx1 + 1)
                for cy in range(cy0, cy1 + 1)
            ]
            out.append(cells)
        return pd.Series(out, dtype=object)

    return _cells(bbox_col)


def bboxes_intersect(a: Column, b: Column) -> Column:
    """JVM-side bbox intersection test over two [minx,miny,maxx,maxy]
    arrays — the cheap refinement after a grid-cell equi-join."""
    return (
        (a.getItem(0) <= b.getItem(2))
        & (a.getItem(2) >= b.getItem(0))
        & (a.getItem(1) <= b.getItem(3))
        & (a.getItem(3) >= b.getItem(1))
    )
