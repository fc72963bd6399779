"""KMV distinct sketches (operators/sketches.py): exact merge algebra
(sketch(A ∪ B) == merge(sketch A, sketch B) — a KMV identity, not an
approximation), exact-mode below k, partitioning invariance, estimator
accuracy, and the fused one-pass plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kamu_cli_spark.operators.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_shingle_sketch,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_sketch_of_union(spark):
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    k = 64
    merged = kmv_merge(
        kmv_shingle_sketch(a, k=k), kmv_shingle_sketch(b, k=k), k=k
    )
    whole = kmv_shingle_sketch(docs, k=k)
    assert _rows(merged) == _rows(whole)


def test_exact_mode_below_k(spark):
    df = spark.createDataFrame(
        [(1, "s", "alpha beta gamma delta")], "doc_id long, source string, text string"
    )
    # 2 trigrams -> n_sketch = 2 < k, estimate must be EXACT
    est = kmv_estimate(kmv_shingle_sketch(df, k=256), k=256).collect()
    assert len(est) == 1
    r = est[0]
    assert r["n_sketch"] == 2 and r["distinct_est"] == 2


def test_sketch_matches_pure_python(spark):
    # pin the hash + top-k semantics against a from-scratch reference
    df = spark.createDataFrame(
        [(i, "s", f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(30)],
        "doc_id long, source string, text string",
    )
    k = 8
    grams = set()
    for i in range(30):
        toks = [f"tok{i}", f"tok{i+1}", f"tok{i+2}", f"tok{i+3}"]
        for j in range(2):
            grams.add(" ".join(toks[j : j + 3]))
    hashes = sorted(
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    )[:k]
    got = [r["u"] for r in kmv_shingle_sketch(df, k=k).orderBy("u").collect()]
    assert got == hashes


def test_partitioning_invariant(spark):
    docs = _docs(spark)
    a = _rows(kmv_estimate(kmv_shingle_sketch(docs, k=64), k=64))
    b = _rows(
        kmv_estimate(kmv_shingle_sketch(docs.repartition(13), k=64), k=64)
    )
    assert a == b


def test_estimator_within_tolerance(spark):
    from kamu_cli_spark.operators.dedup import explode_shingles_arrow

    docs = _docs(spark)
    est = {
        r["source"]: r["distinct_est"]
        for r in kmv_estimate(kmv_shingle_sketch(docs, k=256), k=256).collect()
    }
    sh = explode_shingles_arrow(docs, "doc_id", "text", 3)
    exact = {
        r["source"]: r["x"]
        for r in sh.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.countDistinct("gram").alias("x"))
        .collect()
    }
    for s, x in exact.items():
        assert abs(est[s] - x) / x < 0.25  # ~4 sigma at k=256


def test_ledger_round_trip_and_incremental_merge(spark, tmp_path):
    # commit day-1 sketch; day-2 arrives as a NEW slice only — merge
    # the ledger state with the fresh partial and the result must equal
    # a from-scratch sketch of the full corpus
    from datetime import datetime, timezone

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_kmv_sketch, save_kmv_sketch

    def _d(day):
        return datetime(2024, 3, day, tzinfo=timezone.utc)

    docs = _docs(spark)
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    k = 64
    ds = Dataset.create(str(tmp_path), "kmv", system_time=_d(1).isoformat())
    save_kmv_sketch(
        spark, ds, kmv_shingle_sketch(day1, k=k),
        system_time=_d(2), source_event_time=_d(2),
    )
    merged = kmv_merge(load_kmv_sketch(spark, ds), kmv_shingle_sketch(day2, k=k), k=k)
    assert _rows(merged) == _rows(kmv_shingle_sketch(docs, k=k))


def test_streaming_incremental_sketch(spark, tmp_path):
    # live-crawl telemetry: each micro-batch's partial sketch merges
    # into the ledger state via foreachBatch; after the stream drains,
    # the ledger sketch must equal a from-scratch batch sketch of
    # everything seen — the mergeability property doing real work
    from datetime import datetime, timezone

    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.model_store import load_kmv_sketch, save_kmv_sketch

    import glob
    import os

    docs = _docs(spark).select("doc_id", "source", "text")
    src = str(tmp_path / "stream_src")
    # FORCE a shingle-free FIRST micro-batch (oldest mtime — the file
    # source processes oldest-first): its partial sketch is empty, so
    # the sink's if_empty="skip" guard is exercised rather than dodged
    # — without it save_kmv_sketch raises inside foreachBatch and
    # kills the stream (the latent hazard VERDICT r13 flagged here)
    shingle_free = spark.createDataFrame(
        [(10_000_000, "synthetic", "too short")], docs.schema
    )
    shingle_free.coalesce(1).write.parquet(src)
    f1 = glob.glob(os.path.join(src, "*.parquet"))
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    os.utime(f1[0], (1_000_000_000, 1_000_000_000))  # strictly oldest
    for i, f in enumerate(
        sorted(set(glob.glob(os.path.join(src, "*.parquet"))) - set(f1))
    ):
        os.utime(f, (1_000_000_100 + 10 * i,) * 2)
    k = 64
    ds = Dataset.create(
        str(tmp_path), "kmv",
        system_time=datetime(2024, 3, 1, tzinfo=timezone.utc).isoformat(),
    )
    state = {"committed": 0, "skipped": 0}

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        part = kmv_shingle_sketch(batch_df, k=k)
        prev = load_kmv_sketch(batch_df.sparkSession, ds)
        merged = part if prev is None else kmv_merge(prev, part, k=k)
        t = datetime(2024, 3, 2 + state["committed"], tzinfo=timezone.utc)
        res = save_kmv_sketch(
            batch_df.sparkSession, ds, merged,
            system_time=t, source_event_time=t, if_empty="skip",
        )
        state["committed" if res is not None else "skipped"] += 1

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(180)
    assert state["skipped"] >= 1  # the shingle-free batch hit the guard
    assert state["committed"] >= 1
    final = load_kmv_sketch(spark, ds)
    # the shingle-free doc contributes nothing: final == sketch of docs
    assert _rows(final) == _rows(kmv_shingle_sketch(docs, k=k))


def test_plan_is_one_fused_pass(spark):
    # the corpus side must be ONE mapInPandas (no exploded gram table,
    # no data-sized join); only the KB-sized partials reach an exchange
    plan = (
        kmv_shingle_sketch(_docs(spark), k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    for forbidden in ("Join", "Generate", "Expand"):
        assert forbidden not in plan, plan


def test_pair_overlap_matches_pure_python_and_bounds_exact_jaccard(spark):
    # (a) the sketch-level computation must be exact vs a from-scratch
    # reference over the same k-min sketches; (b) the estimate must
    # land within the ~1/sqrt(k) theory bound of the TRUE Jaccard
    import hashlib
    import re
    from itertools import combinations

    from kamu_cli_spark.operators.sketches import kmv_pair_overlap

    docs = _docs(spark)
    k = 256
    got = {
        (r["a"], r["b"]): (
            r["n_union_sketch"], r["n_common"], r["jaccard_e6"],
            r["union_est"], r["inter_est"],
        )
        for r in kmv_pair_overlap(
            kmv_shingle_sketch(docs, k=k), k=k
        ).collect()
    }
    ws = re.compile(r"\s+", re.ASCII)
    sets: dict = {}
    for row in docs.select("source", "text").collect():
        if row["source"] is None:
            continue
        toks = [t for t in ws.split((row["text"] or "").lower()) if t]
        for j in range(len(toks) - 2):
            sets.setdefault(row["source"], set()).add(
                " ".join(toks[j : j + 3])
            )
    sk_py = {
        s: sorted(
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in gs
        )[:k]
        for s, gs in sets.items()
    }
    n_pairs = 0
    for a, b in combinations(sorted(sets), 2):
        A, B = set(sk_py[a]), set(sk_py[b])
        su = sorted(A | B)[:k]
        nc = sum(1 for x in su if x in A and x in B)
        nu = len(su)
        assert got[(a, b)][:2] == (nu, nc), (a, b)
        assert got[(a, b)][2] == (1000000 * nc) // nu
        true_j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        # 4 sigma at k=256 (sigma ~ 1/16)
        assert abs(got[(a, b)][2] / 1e6 - true_j) < 0.25
        n_pairs += 1
    assert len(got) == n_pairs  # every unordered pair, exactly once


def test_pair_overlap_identical_strata_jaccard_one(spark):
    # a stratum unioned with a relabeled copy of itself: J = 1 and
    # the intersection estimate equals the union estimate
    from kamu_cli_spark.operators.sketches import (
        kmv_estimate,
        kmv_pair_overlap,
    )

    docs = _docs(spark).select("doc_id", "source", "text")
    twin = docs.withColumn("source", F.concat(F.col("source"), F.lit("~copy")))
    k = 64
    sk = kmv_shingle_sketch(docs.unionByName(twin), k=k)
    est = {
        r["source"]: r["distinct_est"]
        for r in kmv_estimate(sk, k=k).collect()
    }
    for r in kmv_pair_overlap(sk, k=k).collect():
        if r["b"] == r["a"] + "~copy":
            assert r["jaccard_e6"] == 1000000
            assert r["n_common"] == r["n_union_sketch"]
            assert r["inter_est"] == r["union_est"] == est[r["a"]]


def test_pair_overlap_plan_is_sketch_sized(spark):
    # nothing data-sized after the one sketch pass: the pair table is
    # a broadcast cross of the bounded strata dimension, membership
    # and top-k run over |pairs| x 2k rows; no corpus-side shuffle
    from kamu_cli_spark.operators.sketches import kmv_pair_overlap

    sk = kmv_shingle_sketch(_docs(spark), k=64)
    p = (
        kmv_pair_overlap(sk, k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    # the sketch is localCheckpointed ONCE inside the operator (it is
    # consumed three times); the overlap plan itself must contain NO
    # corpus pass at all
    assert p.count("MapInPandas") == 0, p
