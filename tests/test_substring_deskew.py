"""Round-10 de-skew of duplicate_spans (VERDICT r9 "What's wrong #2"):
the duplicated-window count must be a map-side-combined groupBy, never
a `count() OVER (PARTITION BY key)` — window functions get no partial
aggregation, so one boilerplate span repeated across a large corpus
fraction would serialize every occurrence into a single reducer task.
Asserted two ways: a hot-key fixture (one span planted in 50% of 100k
docs) stays correct, and the physical plan shows partial aggregation +
a semi join, with no Window operator keyed on the span hash."""

from __future__ import annotations

from kamu_cli_spark.operators.dedup import duplicate_spans, strip_duplicate_spans


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


def test_hot_key_fixture_correct(spark):
    """50k of 100k docs contain ONE identical 8-token span (plus
    per-doc unique filler): the de-skewed count must still find exactly
    the planted cover — one (2, 9, 8) span per even doc, nothing on
    odd docs."""
    n = 100_000
    docs = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 2 = 0 then "
        f"  concat('u', id, 'a u', id, 'b {SHARED} u', id, 'c u', id, 'd') "
        "else concat('v', id, 'a v', id, 'b v', id, 'c v', id, 'd') end as text",
    )
    out = duplicate_spans(docs, "doc_id", min_len=8)
    agg = out.selectExpr(
        "count(*) as rows",
        "sum(cast(doc_id % 2 = 0 as int)) as even_rows",
        "min(span_start) as mn_s",
        "max(span_start) as mx_s",
        "min(span_end) as mn_e",
        "max(span_end) as mx_e",
        "min(span_tokens) as mn_t",
        "max(span_tokens) as mx_t",
    ).collect()[0]
    assert agg["rows"] == n // 2 == agg["even_rows"]
    assert (agg["mn_s"], agg["mx_s"]) == (2, 2)
    assert (agg["mn_e"], agg["mx_e"]) == (9, 9)
    assert (agg["mn_t"], agg["mx_t"]) == (8, 8)


def test_count_plan_is_partial_agg_semi_join_not_window(spark):
    docs = spark.createDataFrame(
        [(1, SHARED + " x1"), (2, SHARED + " y2")], "doc_id bigint, text string"
    )
    # materialize_occurrences=False keeps the full lineage visible so
    # the plan assertions see the count/join stage (the checkpointed
    # default truncates the plan at an ExistingRDD scan)
    p = _plan(duplicate_spans(docs, "doc_id", min_len=8,
                              materialize_occurrences=False))
    # map-side combine on the key count: partial_count before exchange
    assert "partial_count" in p
    # dup keys come back via a semi join, not a per-key window
    assert "LeftSemi" in p
    # no Window operator may partition by the span-hash columns — the
    # only legal windows are the per-doc (id-keyed) island merge
    for line in p.splitlines():
        if "Window" in line and "__kh" in line:
            raise AssertionError(f"span-hash keyed window survived: {line}")


def test_strip_emits_zero_token_docs(spark):
    """ADVICE r9: a zero-token (empty / whitespace-only) doc must still
    appear in strip_duplicate_spans output with clean_text='' and zero
    counts, matching strip_contaminated_spans' every-doc semantics."""
    docs = spark.createDataFrame(
        [
            (1, SHARED + " a1"),
            (2, SHARED + " b2"),
            (3, ""),
            (4, "   "),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(
        docs, "doc_id", min_len=8
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    for i in (3, 4):
        assert out[i]["clean_text"] == ""
        assert out[i]["kept_tokens"] == 0
        assert out[i]["removed_tokens"] == 0
