"""Physical-plan shape regression tests: the structural properties
PLANS.md documents, asserted mechanically so they cannot silently
regress. These are the properties that matter at 100 TB — filter/column
pushdown to the scan, no cartesian products, map-only pipelines staying
shuffle-free, and shuffle counts staying at the semantic minimum —
checked on the optimizer's physical plan at sf0.001 (plan shape is
scale-invariant; only AQE's runtime join demotions vary with size).
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def n_exchanges(p: str) -> int:
    # count Exchange operator nodes (shuffles + broadcasts are listed
    # as Exchange / BroadcastExchange in formatted mode)
    return len(re.findall(r"\(\d+\) Exchange", p))


class TestPushdown:
    def test_q6_filters_and_pruning_reach_scan(self, spark):
        p = plan(spark, "tpch_q6")
        assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:300]
        # projection pruned: the wide lineitem columns never leave parquet
        read_schema = p.split("ReadSchema")[1].splitlines()[0]
        assert "l_extendedprice" in read_schema
        assert "l_comment" not in read_schema and "l_orderkey" not in read_schema

    def test_tail_is_topk_not_global_sort(self, spark):
        # on raw parquet (no ledger offsets to prune by) tail must be
        # the O(limit) top-k operator, never a full global sort
        p = plan(spark, "events_tail")
        assert "TakeOrderedAndProject" in p


class TestJoinStrategy:
    @pytest.mark.parametrize(
        "name",
        ["tpch_q3", "tpch_q5", "orders_lineitem_interval_join",
         "orders_events_asof_join", "embeddings_ann_lsh", "embeddings_ivf_ann",
         "embeddings_ivf_ann3",
         # cross-corpus family: candidates must come from equi-joins on
         # fingerprints/buckets, never a cross join
         "documents_cross_dedup", "documents_cross_lsh",
         "embeddings_cross_neardup",
         # round-8 family: bloom membership is broadcast joins only;
         # kmeans assignment is map-only; semantic dedup pairs come
         # from per-cluster Arrow groups, never a corpus cross join
         "documents_cross_bloom", "embeddings_kmeans",
         "embeddings_semantic_dedup", "documents_gram_novelty",
         "documents_stratified_sample",
         # round-9: hierarchical assignment stays map-only; substring
         # dedup candidates come from an md5-key equi-join + window;
         # contaminated_spans is a pure stateless Arrow map
         "embeddings_kmeans_hier", "documents_substring_dedup",
         "documents_contaminated_spans", "documents_strip_spans",
         "documents_scrub_contaminated", "purchase_graph_pagerank",
         # round-10: against-corpus span family — bloom prefilter is
         # broadcast joins, confirmation is an equi semi join
         "documents_spans_against_corpus",
         "documents_strip_against_corpus",
         # bigram LM: model join is an equi join on (w1, w2)
         "documents_ngram_lm",
         # round-11: DSIR = two LM score passes + id equi-joins;
         # BPE apply = bounded-broadcast stateless Arrow map (the fit
         # loop runs at plan-BUILD time, so bpe_tokenized's plan is the
         # apply map over the crawl)
         "documents_dsir_weights", "documents_bpe_tokenized",
         # late round-11: bm25 scores inside one Arrow kernel (stats
         # are closure constants — no data-sized join anywhere);
         # covariance merges bounded upper-triangle partials;
         # dsir_select/mixture/influence thresholds come from bounded
         # histograms / literal maps, never a cross join
         "documents_bm25", "embeddings_covariance",
         "documents_dsir_select", "documents_mixture_rebalance",
         "documents_source_influence",
         # round-12: the KMV sketch is one fused Arrow pass + a
         # KB-sized top-k; kcenter's selection loop runs at plan-BUILD
         # time, so the final plan is the incremental least() column
         # over one scan; leakage split is an equi left join against
         # the cluster table + a stateless md5 assignment
         "documents_kmv_distinct", "embeddings_kcenter",
         "documents_leakage_split",
         # round-13: the CMS sketch is one fused Arrow pass + a bounded
         # counter aggregate; the probe is a broadcast equi join over
         # the depth-expanded candidate set (BroadcastNestedLoopJoin on
         # the 4-row depth range is fine, CartesianProduct is not)
         "documents_cms_heavy_hitters"],
    )
    def test_no_cartesian_products(self, spark, name):
        p = plan(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name

    def test_dimensions_broadcast_in_q5(self, spark):
        p = plan(spark, "tpch_q5")
        assert "BroadcastHashJoin" in p
        # one exchange per fact table is the floor (r13: the default
        # plan shuffled orders TWICE — custkey then orderkey; the
        # customer-dim broadcast removed the custkey exchange). Allow
        # the two fact-side orderkey exchanges + the final agg.
        assert p.count("Exchange hashpartitioning") <= 3, p

    def test_q5_dim_broadcast_is_cost_based(self, spark, monkeypatch):
        # VERDICT r13 #4: the hint must drop ITSELF past the
        # documented bound. Disable Catalyst's own auto-broadcast so
        # the hint is the only broadcast source (at sf0.001 everything
        # auto-broadcasts and would mask the fallback): with the bar
        # forced below the customer scan estimate the custkey hash
        # exchange returns; with the real bar the hint still fires.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            hinted = plan(spark, "tpch_q5")
            assert "BroadcastHashJoin" in hinted
            assert "hashpartitioning(o_custkey" not in hinted
            monkeypatch.setattr(entry, "_Q5_DIM_MAX_BYTES", 1)
            dropped = plan(spark, "tpch_q5")
            assert "hashpartitioning(o_custkey" in dropped, dropped
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_snapshot_cdc_full_outer_is_sort_merge(self, spark):
        # broadcast is semantically impossible for full outer — the
        # planner must pick SMJ/shuffled-hash, never nested-loop
        p = plan(spark, "customer_snapshot_cdc")
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


class TestShuffleBudget:
    def test_map_only_ops_have_no_keyed_shuffle(self, spark):
        # spread() may inject a RoundRobin repartition to parallelize a
        # single small file — keyless, disappears at real scale. What
        # must never appear is a semantic (hash/range) exchange.
        for name in ("documents_quality_filter", "documents_pii_scrub"):
            p = plan(spark, name)
            assert "hashpartitioning" not in p, name
            assert "rangepartitioning" not in p, name

    def test_exact_dedup_is_one_shuffle(self, spark):
        assert n_exchanges(plan(spark, "documents_dedup_exact")) == 1

    def test_global_shuffle_is_one_exchange_no_global_sort(self, spark):
        p = plan(spark, "documents_global_shuffle")
        assert n_exchanges(p) == 1
        # the per-shard window sorts inside its partition; a range
        # exchange would mean an accidental global ordering
        assert "rangepartitioning" not in p

    def test_partial_aggregation_before_exchange(self, spark):
        # map-side combine on the headline aggregate
        p = plan(spark, "tpch_q1")
        assert "partial_sum" in p

    def test_bm25_has_no_data_sized_join_or_agg(self, spark):
        # the scoring kernel carries the corpus constants in its
        # closure: the graded plan is scan -> kernel -> top-k window;
        # a join or aggregate here means the twice-evaluated tf
        # regression came back
        p = plan(spark, "documents_bm25")
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
        assert "MapInPandas" in p

    def test_covariance_merge_is_partial_agg(self, spark):
        # the only shuffle merges bounded upper-triangle partials with
        # map-side combine
        p = plan(spark, "embeddings_covariance")
        assert "MapInPandas" in p
        assert "partial_sum" in p


class TestArrowKernels:
    @pytest.mark.parametrize(
        "name",
        ["documents_quality_filter", "documents_pii_scrub",
         "embeddings_centroid_stats", "documents_repetition"],
    )
    def test_arrow_eval_python_present(self, spark, name):
        # the per-row kernels must be Arrow-batched mapInPandas, not
        # row-at-a-time BatchEvalPython
        p = plan(spark, name)
        assert "MapInPandas" in p, name
        assert "BatchEvalPython" not in p, name
