"""Dependency-free ESRI Shapefile parser (.shp geometry + .dbf
attributes → GeoJSON-style features).

Implements the subset of the public ESRI Shapefile Technical
Description (1998) and dBase III header layout the ingest path needs —
shape types Null(0), Point(1), PolyLine(3), Polygon(5), MultiPoint(8)
and their M/Z variants (M/Z payloads ignored, XY kept). Feature parity
target: the reference's shapefile reader
(src/infra/ingest-datafusion/src/readers/shapefile.rs:58-230), which
likewise emits one record per shape with attributes as columns and the
geometry serialized as a GeoJSON string.

Polygon rings: shapefiles store outer rings clockwise and holes
counter-clockwise in one flat part list; rings are regrouped into
GeoJSON Polygon / MultiPolygon by signed-area orientation.
"""

from __future__ import annotations

import os
import struct
from typing import Any, BinaryIO


class ShapefileError(Exception):
    pass


# -- .shp geometry ------------------------------------------------------


def _ring_area(points: list[list[float]]) -> float:
    """Signed shoelace area: negative = clockwise (shapefile outer)."""
    s = 0.0
    for i in range(len(points) - 1):
        x1, y1 = points[i]
        x2, y2 = points[i + 1]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _polygon_geometry(rings: list[list[list[float]]]) -> dict:
    polys: list[list[list[list[float]]]] = []
    for ring in rings:
        if _ring_area(ring) < 0 or not polys:  # clockwise → new outer ring
            polys.append([ring])
        else:  # counter-clockwise → hole of the most recent outer
            polys[-1].append(ring)
    if len(polys) == 1:
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


def _parse_shape(content: bytes) -> dict | None:
    (shape_type,) = struct.unpack_from("<i", content, 0)
    base = shape_type % 10 if shape_type in (11, 13, 15, 18, 21, 23, 25, 28) else shape_type
    if base == 0:
        return None
    if base == 1:  # Point
        x, y = struct.unpack_from("<2d", content, 4)
        return {"type": "Point", "coordinates": [x, y]}
    if base == 8:  # MultiPoint: bbox, n, points
        (n,) = struct.unpack_from("<i", content, 36)
        pts = [
            list(struct.unpack_from("<2d", content, 40 + 16 * i)) for i in range(n)
        ]
        return {"type": "MultiPoint", "coordinates": pts}
    if base in (3, 5):  # PolyLine / Polygon: bbox, nparts, npoints, parts, points
        nparts, npoints = struct.unpack_from("<2i", content, 36)
        parts = list(struct.unpack_from(f"<{nparts}i", content, 44))
        pt_off = 44 + 4 * nparts
        pts = [
            list(struct.unpack_from("<2d", content, pt_off + 16 * i))
            for i in range(npoints)
        ]
        rings = [
            pts[parts[i] : (parts[i + 1] if i + 1 < nparts else npoints)]
            for i in range(nparts)
        ]
        if base == 3:
            if len(rings) == 1:
                return {"type": "LineString", "coordinates": rings[0]}
            return {"type": "MultiLineString", "coordinates": rings}
        return _polygon_geometry(rings)
    raise ShapefileError(f"unsupported shape type: {shape_type}")


def read_shp(f: BinaryIO) -> list[dict | None]:
    header = f.read(100)
    if len(header) < 100 or struct.unpack_from(">i", header, 0)[0] != 9994:
        raise ShapefileError("not a shapefile (bad magic)")
    shapes: list[dict | None] = []
    while True:
        rec_header = f.read(8)
        if len(rec_header) < 8:
            break
        _, content_words = struct.unpack(">2i", rec_header)
        content = f.read(content_words * 2)
        shapes.append(_parse_shape(content))
    return shapes


# -- .dbf attributes ----------------------------------------------------


def _dbf_value(raw: bytes, ftype: str, decimals: int) -> Any:
    text = raw.decode("utf-8", errors="replace").strip()
    if ftype == "C":
        return text or None
    if text == "":
        return None
    if ftype in ("N", "F"):
        try:
            return float(text) if (decimals or "." in text or ftype == "F") else int(text)
        except ValueError:
            return None
    if ftype == "L":
        return True if text in "YyTt" else False if text in "NnFf" else None
    if ftype == "D":  # YYYYMMDD → ISO
        return f"{text[0:4]}-{text[4:6]}-{text[6:8]}" if len(text) == 8 else None
    return text or None


def read_dbf(f: BinaryIO) -> list[dict]:
    header = f.read(32)
    if len(header) < 32:
        raise ShapefileError("truncated dbf header")
    n_records, header_len, record_len = struct.unpack_from("<IHH", header, 4)
    fields = []
    while True:
        desc = f.read(1)
        if desc == b"\x0d":
            break
        desc += f.read(31)
        if len(desc) < 32:
            raise ShapefileError("truncated dbf field descriptor")
        name = desc[:11].split(b"\x00")[0].decode("ascii", errors="replace")
        ftype = chr(desc[11])
        length, decimals = desc[16], desc[17]
        fields.append((name, ftype, length, decimals))
    f.seek(header_len)
    records = []
    for _ in range(n_records):
        raw = f.read(record_len)
        if len(raw) < record_len:
            break
        if raw[0:1] == b"\x2a":  # deleted
            continue
        rec, off = {}, 1
        for name, ftype, length, decimals in fields:
            rec[name] = _dbf_value(raw[off : off + length], ftype, decimals)
            off += length
        records.append(rec)
    return records


# -- combined -----------------------------------------------------------


def read_features(shp_path: str) -> list[dict]:
    """(geometry, properties) features for a .shp (+ sibling .dbf)."""
    with open(shp_path, "rb") as f:
        shapes = read_shp(f)
    dbf_path = os.path.splitext(shp_path)[0] + ".dbf"
    if os.path.exists(dbf_path):
        with open(dbf_path, "rb") as f:
            attrs = read_dbf(f)
    else:
        attrs = [{} for _ in shapes]
    if len(attrs) != len(shapes):
        raise ShapefileError(
            f"shp/dbf record count mismatch: {len(shapes)} vs {len(attrs)}"
        )
    return [
        {"type": "Feature", "geometry": geom, "properties": rec}
        for geom, rec in zip(shapes, attrs)
    ]
