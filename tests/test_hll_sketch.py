"""HyperLogLog sketches (operators/sketches.py): bit-exact register
semantics vs a pure-python reference, merge = sketch-of-union (max
algebra), partitioning invariance, estimator accuracy with the
linear-counting correction, the zero-Python bounded-exchange plan,
and the ledger persistence round trip with the empty-skip streaming
guard."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from kamu_cli_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_shingle_sketch,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _py_registers(rows, p=12, n=3):
    """From-scratch HLL register file: md5 15-hex prefix, top p bits
    = register, rho = first-1-bit position of the 60-p rank bits."""
    ws = re.compile(r"\s+", re.ASCII)
    wbits = 60 - p
    reg: dict = {}
    for s, txt in rows:
        if s is None:
            continue
        toks = [t for t in ws.split((txt or "").lower()) if t]
        for j in range(len(toks) - n + 1):
            g = " ".join(toks[j : j + n])
            u = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            r, w = u >> wbits, u & ((1 << wbits) - 1)
            rho = (wbits + 1) if w == 0 else wbits - w.bit_length() + 1
            d = reg.setdefault(s, {})
            d[r] = max(d.get(r, 0), rho)
    return sorted(
        (s, r, rho) for s, d in reg.items() for r, rho in d.items()
    )


def test_registers_match_pure_python(spark):
    docs = _docs(spark)
    got = _rows(hll_shingle_sketch(docs, p=12))
    want = _py_registers(
        [(r["source"], r["text"]) for r in docs.select("source", "text").collect()]
    )
    assert got == want


def test_merge_equals_sketch_of_union(spark):
    docs = _docs(spark)
    a = hll_shingle_sketch(docs.filter(F.col("doc_id") % 2 == 0))
    b = hll_shingle_sketch(docs.filter(F.col("doc_id") % 2 == 1))
    merged = hll_merge(a, b)
    whole = hll_shingle_sketch(docs)
    assert _rows(merged) == _rows(whole)
    # max is idempotent: re-merging the whole corpus changes nothing
    assert _rows(hll_merge(whole, a)) == _rows(whole)


def test_partitioning_invariant(spark):
    docs = _docs(spark)
    a = _rows(hll_shingle_sketch(docs))
    b = _rows(hll_shingle_sketch(docs.repartition(13)))
    assert a == b


def test_estimator_within_tolerance(spark):
    docs = _docs(spark)
    est = {
        r["source"]: r["est_distinct"]
        for r in hll_estimate(hll_shingle_sketch(docs, p=12), p=12).collect()
    }
    ws = re.compile(r"\s+", re.ASCII)
    exact: dict = {}
    for r in docs.select("source", "text").collect():
        if r["source"] is None:
            continue
        toks = [t for t in ws.split((r["text"] or "").lower()) if t]
        for j in range(len(toks) - 2):
            exact.setdefault(r["source"], set()).add(
                " ".join(toks[j : j + 3])
            )
    for s, gs in exact.items():
        # ~1.6% theoretical at p=12; 10% bar absorbs small-corpus bias
        assert abs(est[s] - len(gs)) / len(gs) < 0.10, (s, est[s], len(gs))


def test_linear_counting_exact_for_tiny_corpus(spark):
    # 2 distinct shingles << m: the correction path m*ln(m/V) must
    # round to the exact count
    df = spark.createDataFrame(
        [(1, "s", "alpha beta gamma delta")],
        "doc_id long, source string, text string",
    )
    est = hll_estimate(hll_shingle_sketch(df, p=12), p=12).collect()
    assert len(est) == 1
    assert est[0]["n_registers"] == 2
    assert est[0]["est_distinct"] == 2


def test_sql_engine_matches_arrow_engine(spark):
    # the two physical forms must produce the identical register file
    # (the SQL form is the cross-engine-auditable twin of the fused
    # Arrow default, and IS the oracle's plan)
    docs = _docs(spark)
    assert _rows(hll_shingle_sketch(docs, engine="arrow")) == _rows(
        hll_shingle_sketch(docs, engine="sql")
    )


def test_sql_plan_zero_python_one_bounded_exchange(spark):
    # engine='sql' stays JVM-side: codegen shingles, map-side partial
    # max, one hash exchange of bounded register partials
    sk = hll_shingle_sketch(_docs(spark), engine="sql")
    p = sk._jdf.queryExecution().executedPlan().toString()
    # the explode (Generate) is expected — it feeds the map-side
    # partial max and never shuffles; what must not appear is Python
    # or any join, and the only keyed exchange carries register rows
    for forbidden in ("BatchEvalPython", "MapInPandas", "Join"):
        assert forbidden not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_arrow_plan_one_fused_pass(spark):
    # the default engine is ONE mapInPandas (no exploded gram table,
    # no join); only register partials reach the exchange
    sk = hll_shingle_sketch(_docs(spark), engine="arrow")
    p = sk._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInPandas") == 1
    for forbidden in ("Join", "Generate", "Expand"):
        assert forbidden not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_invalid_params_raise(spark):
    import pytest

    df = _docs(spark)
    for bad_p in (3, 14):
        with pytest.raises(ValueError, match="p must be"):
            hll_shingle_sketch(df, p=bad_p)
    with pytest.raises(ValueError, match="shingle_n"):
        hll_shingle_sketch(df, shingle_n=0)
    with pytest.raises(ValueError, match="engine"):
        hll_shingle_sketch(df, engine="pandas")


def test_ledger_round_trip_and_incremental_merge(spark, tmp_path):
    # commit day-1 registers; day-2 arrives as a new slice — merging
    # ledger state with the fresh partial must equal a from-scratch
    # sketch of the full corpus (max algebra through the CDC chain),
    # and an as-of read reproduces day-1 exactly
    from datetime import datetime, timezone

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_hll_sketch, save_hll_sketch

    def _d(day):
        return datetime(2024, 5, day, tzinfo=timezone.utc)

    docs = _docs(spark)
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    ds = Dataset.create(str(tmp_path), "hll", system_time=_d(1).isoformat())
    save_hll_sketch(
        spark, ds, hll_shingle_sketch(day1),
        system_time=_d(2), source_event_time=_d(2),
    )
    head_v1 = ds.chain.head().block_hash
    merged = hll_merge(load_hll_sketch(spark, ds), hll_shingle_sketch(day2))
    save_hll_sketch(
        spark, ds, merged, system_time=_d(3), source_event_time=_d(3),
    )
    assert _rows(load_hll_sketch(spark, ds)) == _rows(hll_shingle_sketch(docs))
    assert _rows(load_hll_sketch(spark, ds, as_of=head_v1)) == _rows(
        hll_shingle_sketch(day1)
    )
    ds.chain.verify()


def test_save_empty_sketch_raise_vs_skip(spark, tmp_path):
    from datetime import datetime, timezone

    import pytest

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_hll_sketch, save_hll_sketch

    empty = hll_shingle_sketch(
        spark.createDataFrame(
            [(1, "s", "too short")], "doc_id long, source string, text string"
        )
    )
    t = datetime(2024, 5, 2, tzinfo=timezone.utc)
    ds = Dataset.create(
        str(tmp_path), "hll",
        system_time=datetime(2024, 5, 1, tzinfo=timezone.utc).isoformat(),
    )
    with pytest.raises(ValueError, match="empty sketch"):
        save_hll_sketch(spark, ds, empty, system_time=t, source_event_time=t)
    assert (
        save_hll_sketch(
            spark, ds, empty, system_time=t, source_event_time=t,
            if_empty="skip",
        )
        is None
    )
    assert load_hll_sketch(spark, ds) is None
