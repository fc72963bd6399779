"""Geo primitives (`functions/geo.py`): bbox extraction, grid-cell
assignment for big-big spatial joins, and the candidate-pair shape —
the full-join path the housing example's broadcast classify doesn't
exercise."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kamu_cli_spark.functions.geo import (
    bbox_grid_cells,
    bboxes_intersect,
    geom_bbox,
    geom_centroid,
)


def _poly(x, y, r):
    return json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [[x - r, y - r], [x + r, y - r], [x + r, y + r], [x - r, y + r], [x - r, y - r]]
            ],
        }
    )


def test_bbox_and_centroid(spark):
    df = spark.createDataFrame(
        [(1, _poly(2, 3, 1)), (2, _poly(-5, -5, 0.5)), (3, None)],
        "id int, geometry string",
    )
    rows = {
        r["id"]: (r["b"], r["c"])
        for r in df.select(
            "id",
            geom_bbox(F.col("geometry")).alias("b"),
            geom_centroid(F.col("geometry")).alias("c"),
        ).collect()
    }
    assert rows[1][0] == [1.0, 2.0, 3.0, 4.0]
    assert rows[1][1] == [2.0, 3.0]
    assert rows[2][0] == [-5.5, -5.5, -4.5, -4.5]
    assert rows[3] == (None, None)


def test_grid_join_finds_all_intersecting_pairs(spark):
    """Candidate generation must be complete: every truly intersecting
    pair shares at least one grid cell; dedup on (id, id) collapses
    multi-cell duplicates. The end shape is ONE equi-join shuffle."""
    a = spark.createDataFrame(
        [(i, _poly(2.0 * i, 0.0, 0.8)) for i in range(10)], "aid int, geometry string"
    )
    b = spark.createDataFrame(
        [(j, _poly(2.0 * j + 1.0, 0.0, 0.3)) for j in range(10)],
        "bid int, geometry string",
    )

    def cells(df, idc):
        return (
            df.withColumn("bb", geom_bbox(F.col("geometry")))
            .withColumn("cell", F.explode(bbox_grid_cells(F.col("bb"), 2.0)))
            .select(idc, "bb", "cell")
        )

    ca, cb = cells(a, "aid"), cells(b, "bid")
    pairs = (
        ca.join(cb, "cell")
        .filter(bboxes_intersect(ca["bb"], cb["bb"]))
        .select("aid", "bid")
        .distinct()
        .collect()
    )
    got = sorted((r["aid"], r["bid"]) for r in pairs)
    # b_j spans [2j+0.7, 2j+1.3]; a_i spans [2i-0.8, 2i+0.8]:
    # intersects a_j (right edge 2j+0.8 >= 2j+0.7) and a_{j+1}
    # (left edge 2j+1.2 <= 2j+1.3)
    want = sorted(
        [(j, j) for j in range(10)] + [(j + 1, j) for j in range(9)]
    )
    assert got == want
