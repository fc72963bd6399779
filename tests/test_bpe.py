"""BPE tokenizer induction (operators/bpe.py) — round-11 addition:
the Sennrich et al. reference example, greedy-overlap semantics on
self-pair runs, deterministic tie-breaking, early stop, bpe_apply
counts (batch == streaming), and validation."""

from __future__ import annotations

import pytest

from kamu_cli_spark.operators.bpe import _merge_syms, bpe_apply, bpe_fit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_sennrich_reference_merges(spark):
    # the arXiv:1508.07909 vocabulary: low×5, lower×2, newest×6,
    # widest×3 — first merges are (e,s), (es,t), then the l/o family
    docs = _docs(spark, [
        (1, " ".join(["low"] * 5 + ["lower"] * 2)),
        (2, " ".join(["newest"] * 6 + ["widest"] * 3)),
    ])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_fit(docs, n_merges=4).orderBy("rank").collect()
    ]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_greedy_self_pair_every_other():
    # "aaaa" + (a,a) -> ["aa","aa"]; "aaaaa" -> ["aa","aa","a"]
    ap = _merge_syms("a", "a")
    assert ap(list("aaaa")) == ["aa", "aa"]
    assert ap(list("aaaaa")) == ["aa", "aa", "a"]
    assert ap(list("aba")) == ["a", "b", "a"]


def test_greedy_self_pair_distributed_matches(spark):
    # the overlap rule must survive the full distributed loop AND the
    # oracle's window-function replay shape: runs of 'a' of every
    # parity
    docs = _docs(spark, [(1, "aaaa aaaaa aa a baab")])
    m = bpe_fit(docs, n_merges=2).orderBy("rank").collect()
    # raw adjacency count (overlaps included, the standard BPE count):
    # aaaa->3, aaaaa->4, aa->1, baab->1 = 9
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 9)
    # after the greedy every-other application: aaaa->[aa,aa],
    # aaaaa->[aa,aa,a], aa->[aa], baab->[b,aa,b] — (aa,aa) twice
    assert (m[1]["left"], m[1]["right"], m[1]["pair_count"]) == ("aa", "aa", 2)


def test_tie_break_lexicographic(spark):
    # "xy" and "yz" each appear twice -> tie on weight, (x,y) < (y,z)
    docs = _docs(spark, [(1, "xy xy yz yz")])
    m = bpe_fit(docs, n_merges=1).collect()
    assert (m[0]["left"], m[0]["right"]) == ("x", "y")


def test_early_stop_when_no_pairs(spark):
    # single-char words only: no adjacent pair exists
    docs = _docs(spark, [(1, "a b c a b")])
    assert bpe_fit(docs, n_merges=5).count() == 0


def test_apply_counts_and_compression(spark):
    docs = _docs(spark, [(1, "low lower")])
    m = bpe_fit(docs, n_merges=2)  # (l,o) then (lo,w) [weight 2 each]
    rows = {r["doc_id"]: r for r in bpe_apply(docs, m).collect()}
    r = rows[1]
    # low -> [low] (1), lower -> [low,e,r] (3); chars 3+5=8
    assert (r["n_words"], r["n_chars"], r["n_bpe_tokens"]) == (2, 8, 4)
    assert r["compression_e6"] == 1_000_000 * 4 // 8
    # zero-token doc emits zeros
    z = {r["doc_id"]: r for r in bpe_apply(_docs(spark, [(9, "")]), m).collect()}
    assert tuple(z[9])[1:] == (0, 0, 0, 0)


def test_apply_streaming_matches_batch(spark, tmp_path):
    fitdocs = _docs(spark, [(1, "low low lower newest newest")])
    crawl = _docs(spark, [(10, "low lowest"), (11, ""), (12, "new low")])
    m = bpe_fit(fitdocs, n_merges=3)
    want = {tuple(r) for r in bpe_apply(crawl, m).collect()}

    src = tmp_path / "crawl"
    src.mkdir()
    crawl.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(crawl.schema).parquet(str(src))
    out = bpe_apply(stream, m)
    assert out.isStreaming
    name = f"bpe_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql(f"select * from {name}").collect()}
    assert got == want and {r[0] for r in got} == {10, 11, 12}


def test_validation(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        bpe_fit(docs, n_merges=0)


# ---------------------------------------------------------------------
# Property: the distributed loop is bit-identical to a pure-Python
# reference BPE trainer on arbitrary small corpora (hypothesis).

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=12
)


def _ref_bpe(words: list[str], n_merges: int):
    """Driver-side reference: same total order (max weight, then
    lexicographic pair), same greedy L2R application."""
    vocab = Counter(words)
    syms = {w: list(w) for w in vocab}
    out = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += c
        if not counts:
            break
        (l, r), wgt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, l, r, wgt))
        ap = _merge_syms(l, r)
        syms = {w: ap(s) for w, s in syms.items()}
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=WORDS)
def test_property_matches_reference_trainer(spark, words):
    docs = _docs(spark, [(1, " ".join(words))])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_fit(docs, n_merges=4).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(words, 4)


class TestFertility:
    """bpe_fertility (late round 11): per-stratum token-cost audit —
    a stratum the tokenizer never learned merges for must show higher
    fertility than the stratum the merges were induced on."""

    def test_unserved_stratum_has_higher_fertility(self, spark):
        from kamu_cli_spark.operators.bpe import bpe_fertility, bpe_fit

        served = [(i, "srvd", "abab abab cdcd abab") for i in range(6)]
        foreign = [(100 + i, "frgn", "xyqz wvut xyqz qqpp") for i in range(6)]
        df = spark.createDataFrame(
            served + foreign, "doc_id long, source string, text string"
        )
        # induce merges ONLY on the served stratum's idiom
        merges = bpe_fit(
            spark.createDataFrame(served, "doc_id long, source string, text string"),
            n_merges=4,
        )
        out = {r["source"]: r for r in bpe_fertility(df, merges).collect()}
        assert set(out) == {"srvd", "frgn"}
        assert out["srvd"]["n_docs"] == out["frgn"]["n_docs"] == 6
        # foreign words never merge: fertility stays at chars/word
        assert out["frgn"]["fertility_e6"] > out["srvd"]["fertility_e6"]
        assert (
            out["frgn"]["n_bpe_tokens"]
            == sum(len(w) for w in "xyqz wvut xyqz qqpp".split()) * 6
        )

    def test_totals_fold_from_per_doc_apply(self, spark):
        from kamu_cli_spark.operators.bpe import (
            bpe_apply,
            bpe_fertility,
            bpe_fit,
        )

        docs = [
            (i, f"s{i % 2}", "abab baba abab" if i % 3 else "zz qq")
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        merges = bpe_fit(df, n_merges=3)
        per = {r["doc_id"]: r for r in bpe_apply(df, merges).collect()}
        out = {r["source"]: r for r in bpe_fertility(df, merges).collect()}
        for s in ("s0", "s1"):
            ids = [i for i, src, _ in docs if src == s]
            nw = sum(per[i]["n_words"] for i in ids)
            nb = sum(per[i]["n_bpe_tokens"] for i in ids)
            assert out[s]["n_words"] == nw
            assert out[s]["n_bpe_tokens"] == nb
            assert out[s]["fertility_e6"] == (1_000_000 * nb) // nw
