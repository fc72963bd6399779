"""EsriShapefile reader: spec-conformant fixture bytes → GeoJSON rows.

The fixture .shp/.dbf pair is written byte-by-byte from the public
ESRI/dBase layouts, so the test exercises the real parser, not a
library round trip.
"""

from __future__ import annotations

import json
import struct
import zipfile

from kamu_cli_spark.sources.readers import read_format
from kamu_cli_spark.sources.shapefile import read_dbf, read_features, read_shp


def _shp_bytes(records: list[bytes], shape_type: int) -> bytes:
    total_words = (100 + sum(8 + len(r) for r in records)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    header += struct.pack("<2i", 1000, shape_type) + struct.pack("<8d", *([0.0] * 8))
    body = b""
    for i, rec in enumerate(records):
        body += struct.pack(">2i", i + 1, len(rec) // 2) + rec
    return header + body


def _point(x: float, y: float) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def _polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for ring in rings for p in ring]
    parts, off = [], 0
    for ring in rings:
        parts.append(off)
        off += len(ring)
    out = struct.pack("<i4d2i", 5, 0, 0, 10, 10, len(rings), len(pts))
    out += struct.pack(f"<{len(parts)}i", *parts)
    for x, y in pts:
        out += struct.pack("<2d", x, y)
    return out


def _dbf_bytes(fields: list[tuple[str, str, int, int]], rows: list[list]) -> bytes:
    header_len = 32 + 32 * len(fields) + 1
    record_len = 1 + sum(f[2] for f in fields)
    out = struct.pack(
        "<B3BIHH20x", 0x03, 24, 1, 1, len(rows), header_len, record_len
    )
    for name, ftype, length, dec in fields:
        out += struct.pack(
            "<11sc4xBB14x", name.encode().ljust(11, b"\x00"), ftype.encode(),
            length, dec,
        )
    out += b"\x0d"
    for row in rows:
        out += b"\x20"
        for (name, ftype, length, dec), val in zip(fields, row):
            text = "" if val is None else str(val)
            out += (
                text.rjust(length) if ftype in "NF" else text.ljust(length)
            ).encode()[:length]
    return out


FIELDS = [("name", "C", 12, 0), ("pop", "N", 8, 0), ("active", "L", 1, 0),
          ("founded", "D", 8, 0)]
ROWS = [["kyiv", 2967, "T", "04820101"], ["lviv", 717, "F", "12560101"]]


def _fixture(tmp_path):
    # one point + one polygon-with-hole (outer CW, hole CCW per spec)
    outer = [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]  # clockwise
    hole = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]  # counter-clockwise
    shp = _shp_bytes([_point(30.5, 50.4), _polygon([outer, hole])], 1)
    (tmp_path / "cities.shp").write_bytes(shp)
    (tmp_path / "cities.dbf").write_bytes(_dbf_bytes(FIELDS, ROWS))
    return tmp_path / "cities.shp"


def test_parse_shp_and_dbf(tmp_path):
    shp = _fixture(tmp_path)
    with open(shp, "rb") as f:
        shapes = read_shp(f)
    assert shapes[0] == {"type": "Point", "coordinates": [30.5, 50.4]}
    assert shapes[1]["type"] == "Polygon"
    assert len(shapes[1]["coordinates"]) == 2  # outer + hole

    with open(tmp_path / "cities.dbf", "rb") as f:
        attrs = read_dbf(f)
    assert attrs == [
        {"name": "kyiv", "pop": 2967, "active": True, "founded": "0482-01-01"},
        {"name": "lviv", "pop": 717, "active": False, "founded": "1256-01-01"},
    ]

    feats = read_features(str(shp))
    assert len(feats) == 2 and feats[0]["properties"]["name"] == "kyiv"


def test_read_shapefile_zip_to_dataframe(spark, tmp_path):
    _fixture(tmp_path)
    zpath = tmp_path / "cities.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(tmp_path / "cities.shp", "cities.shp")
        z.write(tmp_path / "cities.dbf", "cities.dbf")

    df = read_format(spark, "esrishapefile", str(zpath))
    rows = {r["name"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"kyiv", "lviv"}
    assert rows["kyiv"]["pop"] == 2967 and rows["kyiv"]["active"] is True
    geom = json.loads(rows["kyiv"]["geometry"])
    assert geom == {"type": "Point", "coordinates": [30.5, 50.4]}
    poly = json.loads(rows["lviv"]["geometry"])
    assert poly["type"] == "Polygon" and len(poly["coordinates"]) == 2
