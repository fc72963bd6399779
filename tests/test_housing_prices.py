"""End-to-end run of the housing_prices example port (geo readers +
attribute join + spatial classification; reference
examples/housing_prices + notebook.ipynb)."""

from __future__ import annotations

import json

from examples.housing_prices.pipeline import run
from kamu_cli_spark.functions.geo import _point_in_geom


def test_housing_prices_pipeline(spark, tmp_path):
    out = run(spark, str(tmp_path))

    # heatmap: 25 LAND parcels at assessment year 2024; the STRATA row
    # and the 2023 assessment are filtered out
    heat = {r["pid"]: r for r in out["heatmap"].collect()}
    assert len(heat) == 25
    assert "P900" not in heat  # STRATA
    assert heat["P000"]["current_total_value"] == 150000.0
    assert heat["P024"]["current_total_value"] == 100000.0 + 10000 * 24 + 50000.0
    assert heat["P007"]["geometry"].startswith('{"type":"Polygon"')

    # spatial classification: corner blocks land in their quadrants;
    # the out-of-bounds block is excluded
    byblock = {r["block_id"]: r["name"] for r in out["blocks_by_hood"].collect()}
    assert 99 not in byblock            # outside every hood
    assert len(byblock) == 25
    # grid x(i) = 0.9 + 2i: i,j <= 2 -> west/south of the 5.0 boundary
    for bid, name in byblock.items():
        i, j = bid // 5, bid % 5
        ew = "West" if i <= 2 else "East"
        ns = "North" if j > 2 else "South"
        assert name == ns + ew.lower(), (bid, name)

    # the Northeast park (hole ring) excludes its interior
    hood_rows = out["datasets"]["local-area-boundaries"].read(spark).collect()
    ne = next(r for r in hood_rows if r["name"] == "Northeast")
    g = json.loads(ne["geometry"])
    assert _point_in_geom(9.0, 9.0, g) is True
    assert _point_in_geom(7.5, 7.5, g) is False  # inside the hole

    # medians (the notebook's 'exercise'): Southwest holds parcels
    # i,j in {0,1,2}^2 -> ids {0,1,2,5,6,7,10,11,12} -> values
    # 150k,160k,170k,200k,210k,220k,250k,260k,270k -> median 210k
    med = {
        r["name"]: (r["median_value"], r["n_parcels"])
        for r in out["hood_medians"].collect()
    }
    assert med["Southwest"] == (210000.0, 9)
    assert set(med) <= {"Southwest", "Southeast", "Northwest", "Northeast"}
