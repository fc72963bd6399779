"""Count-min sketch (sketches.py:cms_gram_sketch/cms_merge/cms_probe):
never-undercount property, exact equality in the collision-free
regime, merge = sketch-of-union additivity, partitioning invariance,
and plan-shape (no cartesian, no row UDF, bounded exchange)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kamu_cli_spark.operators.sketches import (
    cms_gram_sketch,
    cms_merge,
    cms_probe,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps"),
    (2, "a quick brown fox runs the race"),
    (3, "the the the quick quick brown"),
    (4, ""),
    (5, "single"),
]


def _exact_bigrams(docs):
    c: Counter = Counter()
    for _, t in docs:
        w = t.lower().split()
        for j in range(len(w) - 1):
            c[" ".join(w[j : j + 2])] += 1
    return c


def _mk(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_estimates_never_undercount_and_exact_when_sparse(spark):
    df = _mk(spark)
    sk = cms_gram_sketch(df, "text", n=2, depth=4, width=4096)
    exact = _exact_bigrams(DOCS)
    probes = spark.createDataFrame(
        [(g,) for g in exact] + [("never seen",)], "gram string"
    )
    got = {
        r["gram"]: r["est_cnt"]
        for r in cms_probe(sk, probes, depth=4, width=4096).collect()
    }
    for g, c in exact.items():
        assert got[g] >= c  # CMS property: never undercounts
        # width 4096 >> distinct grams here: collision-free => exact
        assert got[g] == c
    assert got["never seen"] == 0


def test_total_mass_per_row_equals_gram_occurrences(spark):
    df = _mk(spark)
    sk = cms_gram_sketch(df, "text", n=2, depth=4, width=64)
    total = sum(_exact_bigrams(DOCS).values())
    per_row = {
        r["row"]: r["s"]
        for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {r: total for r in range(4)}


def test_merge_equals_sketch_of_union(spark):
    a_docs, b_docs = DOCS[:3], DOCS[3:]
    a = cms_gram_sketch(_mk(spark, a_docs), "text", n=2, depth=3, width=128)
    b = cms_gram_sketch(_mk(spark, b_docs), "text", n=2, depth=3, width=128)
    merged = cms_merge(a, b)
    whole = cms_gram_sketch(_mk(spark), "text", n=2, depth=3, width=128)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_partitioning_invariant(spark):
    df = _mk(spark)
    a = cms_gram_sketch(df, "text", n=2, depth=4, width=256)
    b = cms_gram_sketch(df.repartition(7), "text", n=2, depth=4, width=256)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_small_width_forces_overcounts_not_undercounts(spark):
    # width 8 << distinct grams: collisions are certain, estimates
    # must still bound exact counts from above
    df = _mk(spark)
    sk = cms_gram_sketch(df, "text", n=2, depth=2, width=8)
    exact = _exact_bigrams(DOCS)
    probes = spark.createDataFrame([(g,) for g in exact], "gram string")
    got = {
        r["gram"]: r["est_cnt"]
        for r in cms_probe(sk, probes, depth=2, width=8).collect()
    }
    assert all(got[g] >= c for g, c in exact.items())
    assert any(got[g] > c for g, c in exact.items())  # collisions real


def test_plan_shape(spark):
    df = _mk(spark)
    sk = cms_gram_sketch(df, "text", n=2, depth=4, width=4096)
    probes = spark.createDataFrame([("the quick",)], "gram string")
    for frame in (sk, cms_probe(sk, probes)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


def test_ledger_round_trip_and_incremental_merge(spark, tmp_path):
    # commit day-1 sketch; day-2 arrives as a NEW slice only — merging
    # the ledger state with the fresh partial must equal a from-scratch
    # sketch of the full corpus (counter additivity through the CDC
    # chain), and an as-of read reproduces day-1 exactly
    from datetime import datetime, timezone

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_cms_sketch, save_cms_sketch

    def _d(day):
        return datetime(2024, 4, day, tzinfo=timezone.utc)

    df = _mk(spark)
    day1 = df.filter(F.col("doc_id") % 2 == 0)
    day2 = df.filter(F.col("doc_id") % 2 == 1)
    ds = Dataset.create(str(tmp_path), "cms", system_time=_d(1).isoformat())
    save_cms_sketch(
        spark, ds, cms_gram_sketch(day1, "text", n=2, depth=3, width=128),
        system_time=_d(2), source_event_time=_d(2),
    )
    head_v1 = ds.chain.head().block_hash
    merged = cms_merge(
        load_cms_sketch(spark, ds),
        cms_gram_sketch(day2, "text", n=2, depth=3, width=128),
    )
    save_cms_sketch(
        spark, ds, merged, system_time=_d(3), source_event_time=_d(3),
    )
    whole = cms_gram_sketch(df, "text", n=2, depth=3, width=128)
    final = load_cms_sketch(spark, ds)
    assert final.exceptAll(whole).count() == 0
    assert whole.exceptAll(final).count() == 0
    # as-of the first commit: day-1's sketch, bit-for-bit
    day1_sk = cms_gram_sketch(day1, "text", n=2, depth=3, width=128)
    asof = load_cms_sketch(spark, ds, as_of=head_v1)
    assert asof.exceptAll(day1_sk).count() == 0
    assert day1_sk.exceptAll(asof).count() == 0
    ds.chain.verify()


def _one_file_write(df, path, mode="error"):
    """Write df as exactly ONE parquet data file; return its path."""
    import glob
    import os

    before = set(glob.glob(os.path.join(path, "*.parquet")))
    df.coalesce(1).write.mode(mode).parquet(path)
    new = set(glob.glob(os.path.join(path, "*.parquet"))) - before
    assert len(new) == 1
    return new.pop()


def test_streaming_incremental_sketch(spark, tmp_path):
    # live-crawl occurrence telemetry: each micro-batch's partial
    # sketch sums into the ledger state via foreachBatch; after the
    # stream drains, the ledger sketch must equal a from-scratch batch
    # sketch of everything seen — counter additivity doing real work.
    # The FIRST micro-batch is FORCED (via file mtimes — the file
    # source processes oldest-first) to contain only gram-free docs,
    # so its partial sketch is empty and the sink's if_empty="skip"
    # guard is exercised, not dodged: without it, save_cms_sketch
    # raises inside foreachBatch and kills the stream (the round-13
    # order-dependent flake).
    import os
    from datetime import datetime, timezone

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_cms_sketch, save_cms_sketch

    df = _mk(spark)
    src = str(tmp_path / "stream_src")
    gram_free = df.filter(F.col("doc_id").isin(4, 5))  # "", "single"
    grammy = df.filter(~F.col("doc_id").isin(4, 5))
    f1 = _one_file_write(gram_free, src)
    f2 = _one_file_write(grammy, src, mode="append")
    os.utime(f1, (1_000_000_000, 1_000_000_000))  # strictly oldest
    os.utime(f2, (1_000_000_100, 1_000_000_100))
    ds = Dataset.create(
        str(tmp_path), "cms",
        system_time=datetime(2024, 4, 1, tzinfo=timezone.utc).isoformat(),
    )
    state = {"committed": 0, "skipped": 0}

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        part = cms_gram_sketch(batch_df, "text", n=2, depth=3, width=128)
        prev = load_cms_sketch(batch_df.sparkSession, ds)
        merged = part if prev is None else cms_merge(prev, part)
        t = datetime(
            2024, 4, 2 + state["committed"], tzinfo=timezone.utc
        )
        res = save_cms_sketch(
            batch_df.sparkSession, ds, merged,
            system_time=t, source_event_time=t, if_empty="skip",
        )
        state["committed" if res is not None else "skipped"] += 1

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(180)
    # the gram-free first batch must have hit the skip guard, and the
    # grammy batch must have committed
    assert state["skipped"] >= 1
    assert state["committed"] >= 1
    final = load_cms_sketch(spark, ds)
    whole = cms_gram_sketch(df, "text", n=2, depth=3, width=128)
    assert final.exceptAll(whole).count() == 0
    assert whole.exceptAll(final).count() == 0


def test_save_empty_sketch_raise_vs_skip(spark, tmp_path):
    # batch contract: empty sketch raises by default, skips (returns
    # None, no commit) with if_empty="skip"; bad mode rejected
    from datetime import datetime, timezone

    import pytest

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_cms_sketch, save_cms_sketch

    empty = cms_gram_sketch(
        _mk(spark, [(0, ""), (1, "single")]), "text", n=2, depth=3, width=128
    )
    t = datetime(2024, 4, 2, tzinfo=timezone.utc)
    ds = Dataset.create(
        str(tmp_path), "cms",
        system_time=datetime(2024, 4, 1, tzinfo=timezone.utc).isoformat(),
    )
    with pytest.raises(ValueError, match="empty sketch"):
        save_cms_sketch(spark, ds, empty, system_time=t, source_event_time=t)
    assert (
        save_cms_sketch(
            spark, ds, empty, system_time=t, source_event_time=t,
            if_empty="skip",
        )
        is None
    )
    assert load_cms_sketch(spark, ds) is None  # nothing committed
    with pytest.raises(ValueError, match="if_empty"):
        save_cms_sketch(
            spark, ds, empty, system_time=t, source_event_time=t,
            if_empty="maybe",
        )


def test_probe_reserved_columns_raise(spark):
    import pytest

    sk = cms_gram_sketch(_mk(spark), "text", n=2, depth=2, width=64)
    bad = spark.createDataFrame([("x y", 1)], "gram string, cnt long")
    with pytest.raises(ValueError, match="reserved|collide"):
        cms_probe(sk, bad, depth=2, width=64)


def test_invalid_params_raise(spark):
    import pytest

    df = _mk(spark)
    for kw in ({"n": 0}, {"depth": 0}, {"width": 0}):
        with pytest.raises(ValueError, match=">= 1"):
            cms_gram_sketch(df, "text", **kw)


def test_probe_geometry_mismatch_raises(spark):
    # ADVICE r13: probing with depth > sketch depth made the extra
    # rows miss the left join and min() return 0 — silently inverting
    # never-undercount; width below the sketch's max bucket rehashes
    # grams into the wrong buckets. Both now raise up front.
    import pytest

    sk = cms_gram_sketch(_mk(spark), "text", n=2, depth=3, width=4096)
    probes = spark.createDataFrame([("the quick",)], "gram string")
    with pytest.raises(ValueError, match="depth"):
        cms_probe(sk, probes, depth=4, width=4096)
    with pytest.raises(ValueError, match="width"):
        cms_probe(sk, probes, depth=3, width=8)
    # validate=False restores the unchecked hot path
    cms_probe(sk, probes, depth=4, width=4096, validate=False).collect()
    # empty sketch: any geometry is fine, estimates are 0
    empty = cms_gram_sketch(
        _mk(spark, [(0, "")]), "text", n=2, depth=3, width=4096
    )
    got = cms_probe(empty, probes, depth=4, width=64).collect()
    assert got[0]["est_cnt"] == 0
