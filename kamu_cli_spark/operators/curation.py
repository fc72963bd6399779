"""Corpus-curation operators for large-scale training-data pipelines:
rule-based quality filtering, PII scrubbing, domain-mix sampling, and
length-curriculum binning.

Like operators/text.py and operators/sampling.py, every hot-path
expression here is a built-in `pyspark.sql.functions` column (JVM-side,
whole-stage codegen, filter-pushdown safe) — no Python in the per-row
path, no shuffle except the final small aggregates. All primitives are
chosen to be portable to any ANSI engine (DuckDB/Trino) so the exact
keep/drop decisions can be audited cross-system:

- tokenization: split on ``\\s+`` + drop empties (the repo-wide
  convention shared with operators/text.py and the DuckDB oracles);
- sampling: md5-hex-prefix thresholds (lexicographic hex compare ==
  numeric compare — see operators/sampling.py);
- binning: ``length(bin(n))`` == floor(log2 n)+1, an exact integer
  bit-length in both Spark and DuckDB — no float log2 edge cases at
  powers of two.

Reference parity: kamu-cli leaves corpus curation to user SQL; these
are part of the training-data extension surface alongside
operators/dedup.py, operators/text.py, operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kamu_cli_spark.operators.text import LANG_MARKERS, tokens

# ---------------------------------------------------------------------------
# Gopher/C4-style quality-rule battery
# ---------------------------------------------------------------------------

# Rule thresholds follow the published Gopher filters (Rae et al. 2021,
# table A1) scaled to the synthetic corpus: token-count bounds, mean
# word length bounds, minimum alphabetic-token fraction, minimum
# stopword evidence.
QUALITY_RULES = {
    "min_tokens": 10,
    "max_tokens": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "min_alpha_frac": 0.6,
    "min_stop_hits": 2,
}

_STOPWORDS = LANG_MARKERS["en"] + ["a", "in", "that", "it", "for"]


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rules: dict | None = None,
) -> DataFrame:
    """Per-document quality-rule battery -> keep flag + first failing
    rule, Gopher-style.

    One narrow map over the corpus (token arrays materialized once per
    row, every rule derived from them), then no shuffle at all — the
    output is row-per-document and the filter decision is a pushdown-
    safe boolean column downstream stages can prune on. At 100 TB this
    is scan-bound by design.
    """
    r = dict(QUALITY_RULES, **(rules or {}))
    t = F.col(text_col)

    staged = df.select(
        F.col(id_col),
        tokens(t).alias("__toks"),
        tokens(F.lower(t)).alias("__ltoks"),
    )
    n_tok = F.size(F.col("__toks"))
    # sum of token lengths via a fold — stays in codegen, no explode.
    tok_chars = F.aggregate(
        F.col("__toks"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_tok > 0,
        F.size(F.filter(F.col("__toks"), lambda x: x.rlike("[A-Za-z]"))) / n_tok,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(F.col("__ltoks"), _in_stopwords))

    m = staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    checks = [
        ("too_short", F.col("n_tokens") < r["min_tokens"]),
        ("too_long", F.col("n_tokens") > r["max_tokens"]),
        ("word_len_low", F.col("mean_word_len") < r["min_mean_word_len"]),
        ("word_len_high", F.col("mean_word_len") > r["max_mean_word_len"]),
        ("low_alpha", F.col("alpha_frac") < r["min_alpha_frac"]),
        ("few_stopwords", F.col("stop_hits") < r["min_stop_hits"]),
    ]
    fail = F.lit(None).cast("string")
    for name, cond in reversed(checks):
        fail = F.when(cond, F.lit(name)).otherwise(fail)
    return m.select(
        "*",
        fail.isNull().alias("keep"),
        fail.alias("fail_reason"),
    )


def _in_stopwords(x: Column) -> Column:
    return x.isin(_STOPWORDS)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns restricted to syntax that means the same thing in Java regex
# (Spark) and RE2 (DuckDB/Go scrubbers): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}
_REDACTION = "<PII>"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Count and redact PII-shaped spans (emails, IPv4s, intl phone
    numbers) per document.

    Returns (id, n_email, n_ipv4, n_phone, scrubbed_len, scrubbed_md5)
    — the fingerprint lets an auditor verify the scrubbed corpus
    without shipping the text. Pure regex column expressions: one
    narrow map, no shuffle, linear scan at any scale.
    """
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    scrubbed = t
    for pat in PII_PATTERNS.values():
        scrubbed = F.regexp_replace(scrubbed, pat, _REDACTION)
    return df.select(
        F.col(id_col),
        *counts,
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
# Domain-mix sampling
# ---------------------------------------------------------------------------


def domain_mix_summary(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
    hex_width: int = 4,
) -> DataFrame:
    """Deterministic per-domain downsampling audit: each domain keeps a
    configured fraction of its documents, selected by md5-prefix
    threshold on the stable key (same idiom as operators/sampling.py —
    deterministic, driver-free, engine-portable).

    Output is per-domain (n_total, n_kept, achieved_rate): one hash
    aggregate over |domains| groups, so the shuffle is bytes. The keep
    decision itself is a pushdown-safe boolean — the full-corpus
    variant is ``df.filter(domain_keep(...))``, scan-bound at 100 TB.
    """
    keep = domain_keep(
        F.col(key_col), F.col(domain_col), rates, default_rate, salt, hex_width
    )
    return (
        df.select(F.col(domain_col).alias("domain"), keep.alias("__keep"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        )
        .select(
            "domain",
            "n_total",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_total"), 4).alias("achieved_rate"),
        )
    )


def domain_keep(
    key: Column,
    domain: Column,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
    hex_width: int = 4,
) -> Column:
    """Boolean keep decision: hex(md5(key+salt)) prefix < per-domain
    threshold. Lowercase-hex lexicographic compare == numeric compare,
    so the whole thing is a codegen'd string comparison."""
    buckets = 16**hex_width
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, hex_width)

    def keep_for(rate: float) -> Column:
        # rate >= 1 must be an unconditional keep: its hex bound would
        # be one digit WIDER than the prefix ("10000" vs 4 chars) and
        # lexicographic compare against it is NOT numeric compare.
        bound = int(rate * buckets)
        if bound >= buckets:
            return F.lit(True)
        if bound <= 0:
            return F.lit(False)
        return h < F.lit(format(bound, f"0{hex_width}x"))

    expr = keep_for(default_rate)
    for name, rate in sorted(rates.items()):
        expr = F.when(domain == F.lit(name), keep_for(rate)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# Length-curriculum binning
# ---------------------------------------------------------------------------


def length_curriculum(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bucket documents by power-of-two token-count bins (bin = integer
    bit length of the token count) and summarize each bin — the usual
    curriculum/batch-shape audit before packing sequences.

    Exact-integer binning via ``length(bin(n))`` avoids float log2
    edge cases at powers of two and is identical in Spark and DuckDB.
    Unlike ``ntile`` (a single-partition global sort), the bin id is a
    per-row expression: the only shuffle is the final |bins|-group
    aggregate. Scan-bound at any corpus size.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    binned = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.length(F.bin(n_tok.cast("long"))).alias("len_bin"),
    )
    return (
        binned.groupBy("len_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
