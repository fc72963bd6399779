"""Substring-level exact dedup (dedup.py:duplicate_spans /
strip_duplicate_spans, after Lee et al. 2022 ExactSubstr): planted
repeated spans across and within documents, span-merge semantics, and
the strip variant's arithmetic consistency with the span table."""

from __future__ import annotations

from kamu_cli_spark.operators.dedup import duplicate_spans, strip_duplicate_spans

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _uniq(tag: str, n: int) -> str:
    """n guaranteed-unique filler tokens."""
    return " ".join(f"{tag}{i}" for i in range(n))


SHARED = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


class TestDuplicateSpans:
    def test_cross_doc_span_found_and_positioned(self, spark):
        d = _docs(
            spark,
            [
                (1, f"{_uniq('a', 5)} {SHARED} {_uniq('b', 5)}"),
                (2, f"{_uniq('c', 3)} {SHARED}"),
            ],
        )
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in duplicate_spans(d, "doc_id", min_len=8).collect()
        }
        # doc 1: tokens 5..14; doc 2: tokens 3..12
        assert got == {(1, 5, 14, 10), (2, 3, 12, 10)}

    def test_within_doc_repeat_counts(self, spark):
        d = _docs(
            spark,
            [(7, f"{SHARED} {_uniq('x', 4)} {SHARED}")],
        )
        got = {
            (r["span_start"], r["span_end"])
            for r in duplicate_spans(d, "doc_id", min_len=8).collect()
        }
        assert got == {(0, 9), (14, 23)}

    def test_no_false_positives_below_min_len(self, spark):
        # a 7-token shared run must NOT be flagged at min_len=8
        seven = "one two three four five six seven"
        d = _docs(
            spark,
            [
                (1, f"{seven} {_uniq('a', 6)}"),
                (2, f"{seven} {_uniq('b', 6)}"),
            ],
        )
        assert duplicate_spans(d, "doc_id", min_len=8).count() == 0

    def test_adjacent_windows_merge_into_one_span(self, spark):
        # identical 20-token prefix => 13 duplicated 8-windows that must
        # merge into ONE [0,19] span, not 13 rows
        pre = _uniq("p", 20).replace("p", "z")  # z0..z19, unique tokens
        d = _docs(
            spark,
            [(1, f"{pre} {_uniq('a', 4)}"), (2, f"{pre} {_uniq('b', 4)}")],
        )
        rows = duplicate_spans(d, "doc_id", min_len=8).collect()
        per_doc = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in rows}
        assert len(rows) == 2 and per_doc[1] == (0, 19) and per_doc[2] == (0, 19)

    def test_min_len_validation(self, spark):
        with pytest.raises(ValueError):
            duplicate_spans(_docs(spark, [(1, "a b")]), "doc_id", min_len=1)


class TestStripDuplicateSpans:
    def test_strip_removes_exactly_the_span_cover(self, spark):
        d = _docs(
            spark,
            [
                (1, f"{_uniq('a', 5)} {SHARED} {_uniq('b', 5)}"),
                (2, f"{_uniq('c', 3)} {SHARED}"),
                (3, _uniq("d", 12)),  # fully novel doc
            ],
        )
        spans = duplicate_spans(d, "doc_id", min_len=8).collect()
        removed_by_doc = {}
        for r in spans:
            removed_by_doc[r["doc_id"]] = (
                removed_by_doc.get(r["doc_id"], 0) + r["span_tokens"]
            )
        out = {r["doc_id"]: r for r in strip_duplicate_spans(
            d, "doc_id", min_len=8
        ).collect()}
        assert out[1]["removed_tokens"] == removed_by_doc[1] == 10
        assert out[1]["clean_text"] == f"{_uniq('a', 5)} {_uniq('b', 5)}"
        assert out[2]["clean_text"] == _uniq("c", 3)
        assert out[3]["removed_tokens"] == 0
        assert out[3]["kept_tokens"] == 12
        assert out[3]["clean_text"] == _uniq("d", 12)

    def test_fully_duplicated_doc_strips_to_empty(self, spark):
        d = _docs(spark, [(1, SHARED), (2, SHARED)])
        out = {r["doc_id"]: r for r in strip_duplicate_spans(
            d, "doc_id", min_len=8
        ).collect()}
        assert out[1]["clean_text"] == "" and out[1]["kept_tokens"] == 0
        assert out[1]["removed_tokens"] == 10


class TestContaminatedSpans:
    """Span-level contamination vs a bounded eval reference
    (dedup.py:contaminated_spans): positions, stream parity, cap."""

    def _fx(self, spark):
        eval_set = _docs(spark, [(1000, SHARED)])
        docs = _docs(
            spark,
            [
                (1, f"{_uniq('a', 5)} {SHARED} {_uniq('b', 5)}"),
                (2, _uniq("c", 15)),  # clean doc
            ],
        )
        return docs, eval_set

    def test_spans_found_with_positions(self, spark):
        from kamu_cli_spark.operators.dedup import contaminated_spans

        docs, eval_set = self._fx(spark)
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in contaminated_spans(
                docs, eval_set, "doc_id", min_len=8
            ).collect()
        }
        assert got == {(1, 5, 14, 10)}

    def test_streaming_matches_batch(self, spark, tmp_path):
        from kamu_cli_spark.operators.dedup import contaminated_spans

        docs, eval_set = self._fx(spark)
        src = tmp_path / "docs"
        src.mkdir()
        docs.coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        out = contaminated_spans(stream, eval_set, "doc_id", min_len=8)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("cont_spans")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = {
            tuple(r) for r in spark.sql("select * from cont_spans").collect()
        }
        want = {
            tuple(r)
            for r in contaminated_spans(
                docs, eval_set, "doc_id", min_len=8
            ).collect()
        }
        assert got == want == {(1, 5, 14, 10)}

    def test_reference_cap_raises(self, spark):
        from kamu_cli_spark.operators.dedup import contaminated_spans

        docs, eval_set = self._fx(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="driver-collect cap"):
            contaminated_spans(
                docs, eval_set, "doc_id", min_len=8,
                max_reference_windows=1,
            )


class TestStripContaminatedSpans:
    def test_scrub_matches_span_audit(self, spark):
        from kamu_cli_spark.operators.dedup import (
            contaminated_spans,
            strip_contaminated_spans,
        )

        eval_set = _docs(spark, [(1000, SHARED)])
        docs = _docs(
            spark,
            [
                (1, f"{_uniq('a', 5)} {SHARED} {_uniq('b', 5)}"),
                (2, _uniq("c", 15)),
            ],
        )
        spans = contaminated_spans(docs, eval_set, "doc_id", min_len=8).collect()
        removed = {}
        for r in spans:
            removed[r["doc_id"]] = removed.get(r["doc_id"], 0) + r["span_tokens"]
        out = {
            r["doc_id"]: r
            for r in strip_contaminated_spans(
                docs, eval_set, "doc_id", min_len=8
            ).collect()
        }
        assert out[1]["removed_tokens"] == removed[1] == 10
        assert out[1]["clean_text"] == f"{_uniq('a', 5)} {_uniq('b', 5)}"
        assert out[2]["removed_tokens"] == 0
        assert out[2]["clean_text"] == _uniq("c", 15)

    def test_empty_reference_keeps_everything(self, spark):
        from kamu_cli_spark.operators.dedup import strip_contaminated_spans

        docs = _docs(spark, [(1, _uniq("a", 12))])
        empty = _docs(spark, [])
        out = strip_contaminated_spans(docs, empty, "doc_id", min_len=8).collect()
        assert out[0]["removed_tokens"] == 0 and out[0]["kept_tokens"] == 12

    def test_streaming_scrub_matches_batch(self, spark, tmp_path):
        from kamu_cli_spark.operators.dedup import strip_contaminated_spans

        eval_set = _docs(spark, [(1000, SHARED)])
        docs = _docs(
            spark, [(1, f"{_uniq('a', 5)} {SHARED}"), (2, _uniq("c", 10))]
        )
        src = tmp_path / "docs"
        src.mkdir()
        docs.coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        out = strip_contaminated_spans(stream, eval_set, "doc_id", min_len=8)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("scrub_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = {tuple(r) for r in spark.sql("select * from scrub_stream").collect()}
        want = {
            tuple(r)
            for r in strip_contaminated_spans(
                docs, eval_set, "doc_id", min_len=8
            ).collect()
        }
        assert got == want


def test_duplicate_spans_matches_python_reference_on_random_corpus(spark):
    """Randomized cross-check (fixed seed): tiny vocabulary forces
    organic repeats; the operator must equal an independent pure-Python
    computation of duplicated-window cover merged into maximal spans."""
    import random

    rng = random.Random(20240815)
    vocab = [f"w{i}" for i in range(12)]  # tiny -> repeats everywhere
    L = 3
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]

    # pure-Python reference
    from collections import Counter

    windows: dict[int, list[tuple[int, str]]] = {}
    counts: Counter = Counter()
    for i, txt in docs:
        toks = [t for t in txt.lower().split() if t]
        ws = [
            (p, " ".join(toks[p : p + L]))
            for p in range(len(toks) - L + 1)
        ]
        windows[i] = ws
        counts.update(g for _, g in ws)
    want = set()
    for i, ws in windows.items():
        hit = sorted(p for p, g in ws if counts[g] >= 2)
        if not hit:
            continue
        s0 = prev = hit[0]
        for p in hit[1:]:
            if p - prev > L:
                want.add((i, s0, prev + L - 1, prev + L - s0))
                s0 = p
            prev = p
        want.add((i, s0, prev + L - 1, prev + L - s0))

    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(
            _docs(spark, docs), "doc_id", min_len=L
        ).collect()
    }
    assert got == want
