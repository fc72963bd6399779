"""Port of the reference's housing_prices example
(/root/reference/examples/housing_prices/): Vancouver open-data
property datasets — GeoJSON polygon layers + a semicolon CSV tax
report — joined into a land-value heatmap and a spatial
blocks-by-neighbourhood classification.

The reference fetches four datasets by URL (GeoJson / Csv read steps)
and runs the queries of notebook.ipynb on a Sedona kernel
(`st_geomfromgeojson` / `st_intersects`). This port:

- builds deterministic fixture files with the SAME shapes the open
  data endpoints serve (FeatureCollection polygon layers, the
  semicolon-separated tax CSV) — the container has no network;
- ingests them through the repo's own readers
  (`sources.readers.read_geojson` / `read_csv`) into ledger datasets;
- heatmap: attribute equi-join parcels ⋈ tax on
  land_coordinate = tax_coord with the notebook's casts and filters —
  plain Catalyst join, broadcast-able on the dim side;
- blocks_by_hood: the notebook's `st_intersects(block, hood)` spatial
  join, expressed as block-centroid containment
  (`functions.geo.point_in_polygon_tag`): neighbourhood boundaries
  are a small broadcast list, blocks stream through one narrow Arrow
  pass — no shuffle. The notebook leaves the per-hood median value as
  "an exercise"; we compute it (percentile over the classified
  parcels).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.functions.geo import geom_centroid, point_in_polygon_tag
from kamu_cli_spark.operators.merge import MergeStrategyAppend
from kamu_cli_spark.sources.readers import read_csv, read_geojson
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _sq(x: float, y: float, r: float) -> list[list[list[float]]]:
    return [[[x - r, y - r], [x + r, y - r], [x + r, y + r], [x - r, y + r], [x - r, y - r]]]


def _fc(features: list[dict]) -> dict:
    return {"type": "FeatureCollection", "features": features}


def make_fixtures(fixtures_dir: str) -> dict[str, str]:
    """Deterministic stand-ins for the four Vancouver endpoints."""
    os.makedirs(fixtures_dir, exist_ok=True)

    # local-area-boundaries: four quadrant neighbourhoods on [0,10]^2;
    # Northeast carries a hole (a park) to exercise even-odd containment
    hoods = []
    quads = [
        ("Southwest", _sq(2.5, 2.5, 2.5)),
        ("Southeast", _sq(7.5, 2.5, 2.5)),
        ("Northwest", _sq(2.5, 7.5, 2.5)),
        ("Northeast", _sq(7.5, 7.5, 2.5) + _sq(7.5, 7.5, 0.5)),
    ]
    for name, coords in quads:
        hoods.append(
            {
                "type": "Feature",
                "properties": {"name": name},
                "geometry": {"type": "Polygon", "coordinates": coords},
            }
        )
    hoods_path = os.path.join(fixtures_dir, "local_area_boundaries.geojson")
    with open(hoods_path, "w") as f:
        json.dump(_fc(hoods), f)

    # block-outlines: 5x5 grid of blocks; block (11,11) is outside
    # every hood. Grid points sit strictly off the x=5 / y=5 quadrant
    # boundary (a centroid exactly on a shared edge flips by float
    # rounding) and clear of the Northeast park hole — the hole's
    # even-odd semantics are asserted directly in the test.
    blocks = []
    bid = 0
    for i in range(5):
        for j in range(5):
            x, y = 0.9 + 2.0 * i, 0.9 + 2.0 * j
            blocks.append(
                {
                    "type": "Feature",
                    "properties": {"block_id": bid},
                    "geometry": {"type": "Polygon", "coordinates": _sq(x, y, 0.4)},
                }
            )
            bid += 1
    blocks.append(
        {
            "type": "Feature",
            "properties": {"block_id": 99},
            "geometry": {"type": "Polygon", "coordinates": _sq(11.0, 11.0, 0.4)},
        }
    )
    blocks_path = os.path.join(fixtures_dir, "block_outlines.geojson")
    with open(blocks_path, "w") as f:
        json.dump(_fc(blocks), f)

    # parcel-polygons: one parcel per block, keyed by tax_coord
    parcels = []
    for feat in blocks[:-1]:
        b = feat["properties"]["block_id"]
        ring = feat["geometry"]["coordinates"][0]
        cx = sum(p[0] for p in ring[:-1]) / 4
        cy = sum(p[1] for p in ring[:-1]) / 4
        parcels.append(
            {
                "type": "Feature",
                "properties": {"tax_coord": f"TC{b:03d}"},
                "geometry": {"type": "Polygon", "coordinates": _sq(cx, cy, 0.3)},
            }
        )
    parcels_path = os.path.join(fixtures_dir, "parcel_polygons.geojson")
    with open(parcels_path, "w") as f:
        json.dump(_fc(parcels), f)

    # tax-reports: semicolon CSV, string-typed like the real endpoint;
    # one LAND row per parcel (value grows with block id), plus STRATA
    # rows and a pre-2024 assessment year that the query filters out
    tax_path = os.path.join(fixtures_dir, "tax_reports.csv")
    with open(tax_path, "w") as f:
        f.write(
            "PID;LEGAL_TYPE;LAND_COORDINATE;ZONING_DISTRICT;"
            "CURRENT_LAND_VALUE;CURRENT_IMPROVEMENT_VALUE;"
            "TAX_ASSESSMENT_YEAR;REPORT_YEAR\n"
        )
        for b in range(25):
            f.write(
                f"P{b:03d};LAND;TC{b:03d};RS-1;"
                f"{100000 + 10000 * b};{50000};2024;2024\n"
            )
        f.write("P900;STRATA;TC000;RM-4;999999;1;2024;2024\n")
        f.write("P901;LAND;TC001;RS-1;1;1;2023;2023\n")
    return {
        "hoods": hoods_path,
        "blocks": blocks_path,
        "parcels": parcels_path,
        "tax": tax_path,
    }


def ingest(spark: SparkSession, ws: str, fixtures: dict[str, str]) -> dict[str, Dataset]:
    """Readers → Append-merge ledger datasets, one per source layer
    (the manifests' `read: GeoJson` / `read: Csv` + `merge: Append`)."""
    out = {}
    frames = {
        "local-area-boundaries": read_geojson(spark, fixtures["hoods"]),
        "block-outlines": read_geojson(spark, fixtures["blocks"]),
        "parcel-polygons": read_geojson(spark, fixtures["parcels"]),
        "tax-reports": read_csv(spark, fixtures["tax"], separator=";", header=True),
    }
    for name, df in frames.items():
        ds = Dataset.create(ws, name, system_time=T0.isoformat())
        DataWriter(ds, MergeStrategyAppend()).write(spark, df, system_time=T0)
        out[name] = ds
    return out


def heatmap(spark: SparkSession, dss: dict[str, Dataset]) -> DataFrame:
    """notebook.ipynb land-value heatmap: parcels INNER JOIN tax on
    land_coordinate = tax_coord, LAND parcels, 2024 assessment."""
    tax = dss["tax-reports"].read(spark)
    polys = dss["parcel-polygons"].read(spark)
    return (
        polys.alias("polys")
        .join(
            tax.alias("tax"),
            F.col("tax.LAND_COORDINATE") == F.col("polys.tax_coord"),
            "inner",
        )
        .filter(
            (F.col("tax.LEGAL_TYPE") == "LAND")
            & (F.col("tax.TAX_ASSESSMENT_YEAR").cast("int") == 2024)
            & F.col("tax.CURRENT_LAND_VALUE").isNotNull()
        )
        .select(
            F.col("tax.REPORT_YEAR").alias("report_year"),
            F.col("tax.PID").alias("pid"),
            F.col("tax.LEGAL_TYPE").alias("legal_type"),
            F.col("tax.ZONING_DISTRICT").alias("zoning_district"),
            (
                F.col("tax.CURRENT_LAND_VALUE").cast("double")
                + F.col("tax.CURRENT_IMPROVEMENT_VALUE").cast("double")
            ).alias("current_total_value"),
            F.col("polys.geometry").alias("geometry"),
        )
    )


def blocks_by_hood(spark: SparkSession, dss: dict[str, Dataset]) -> DataFrame:
    """notebook.ipynb spatial join: each block classified into the
    neighbourhood containing it (centroid containment; the hole in
    Northeast's polygon correctly excludes the park block)."""
    hood_rows = (
        dss["local-area-boundaries"].read(spark).select("name", "geometry").collect()
    )
    boundaries = [(r["name"], r["geometry"]) for r in sorted(hood_rows)]
    blocks = dss["block-outlines"].read(spark)
    return (
        blocks.withColumn("__c", geom_centroid(F.col("geometry")))
        .withColumn("name", point_in_polygon_tag(F.col("__c"), boundaries))
        .filter(F.col("name").isNotNull())
        .select("name", "block_id", "geometry")
    )


def hood_median_values(
    spark: SparkSession, dss: dict[str, Dataset], heat: DataFrame
) -> DataFrame:
    """The median the notebook leaves 'as an exercise': classify each
    parcel by centroid, join its heatmap value, median per hood."""
    hood_rows = (
        dss["local-area-boundaries"].read(spark).select("name", "geometry").collect()
    )
    boundaries = [(r["name"], r["geometry"]) for r in sorted(hood_rows)]
    parcels = dss["parcel-polygons"].read(spark)
    tagged = (
        parcels.withColumn("__c", geom_centroid(F.col("geometry")))
        .withColumn("name", point_in_polygon_tag(F.col("__c"), boundaries))
        .filter(F.col("name").isNotNull())
        .select("name", "tax_coord")
    )
    joined = tagged.join(
        heat.withColumn("tax_coord", F.regexp_replace("pid", "^P", "TC")),
        "tax_coord",
    )
    return joined.groupBy("name").agg(
        F.median("current_total_value").alias("median_value"),
        F.count(F.lit(1)).alias("n_parcels"),
    )


def run(spark: SparkSession, ws: str) -> dict[str, DataFrame]:
    fixtures = make_fixtures(os.path.join(ws, "_fixtures"))
    dss = ingest(spark, ws, fixtures)
    heat = heatmap(spark, dss)
    return {
        "heatmap": heat,
        "blocks_by_hood": blocks_by_hood(spark, dss),
        "hood_medians": hood_median_values(spark, dss, heat),
        "datasets": dss,
    }
