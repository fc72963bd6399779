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

from kamu_cli_spark.operators.text import LANG_MARKERS

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

    One Arrow-batched ``mapInPandas`` pass over the corpus — no shuffle
    at all; the output is row-per-document and the filter decision is a
    boolean column downstream stages prune on. The interpreted-
    expression form (two array splits + fold + per-token rlike) was 7×
    slower at sf10 and growing with text length — the same lesson as
    :func:`~kamu_cli_spark.operators.text.repetition_metrics`: per-row-
    heavy kernels belong on the Arrow path; at 100 TB this is
    scan-bound by design.

    Determinism contract: tokenization is the repo-wide ``\\s+`` split
    (ASCII, matching Java/RE2 ``\\s``); ratios snap to 4 digits via
    ``floor(x*1e4 + 0.5) / 1e4`` — pure IEEE double arithmetic, the
    same formulation vector_stats uses and the oracle SQL mirrors
    verbatim, so keep/drop decisions are bit-identical across engines
    (decimal-HALF_UP-on-the-exact-binary-value was NOT: Spark/DuckDB
    ``round`` rescale a shortest-repr double and can land on the other
    side of a tie).
    """
    import math as _math
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    from kamu_cli_spark.operators.util import spread

    r = dict(QUALITY_RULES, **(rules or {}))
    ws_re = _re.compile(r"\s+", _re.ASCII)  # Java/RE2 \s parity (see text.py)
    alpha_re = _re.compile(r"[A-Za-z]")
    stopset = frozenset(_STOPWORDS)

    def r4(x: float) -> float:
        # engine-portable 4-digit snap (ratios are non-negative, so
        # floor(+0.5) == half-up); mirrored in the oracle SQL
        return _math.floor(x * 1e4 + 0.5) / 1e4

    def grade(n_tokens, mean_wl, alpha, stops):
        if n_tokens < r["min_tokens"]:
            return "too_short"
        if n_tokens > r["max_tokens"]:
            return "too_long"
        if mean_wl < r["min_mean_word_len"]:
            return "word_len_low"
        if mean_wl > r["max_mean_word_len"]:
            return "word_len_high"
        if alpha < r["min_alpha_frac"]:
            return "low_alpha"
        if stops < r["min_stop_hits"]:
            return "few_stopwords"
        return None

    schema = (
        f"{id_col} long, n_tokens int, mean_word_len double, "
        "alpha_frac double, stop_hits int, keep boolean, fail_reason string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws_re.split(txt or "") if t]
                n = len(toks)
                if n:
                    mean_wl = r4(sum(map(len, toks)) / n)
                    alpha = r4(sum(1 for t in toks if alpha_re.search(t)) / n)
                    stops = sum(1 for t in toks if t.lower() in stopset)
                else:
                    mean_wl = alpha = 0.0
                    stops = 0
                fail = grade(n, mean_wl, alpha, stops)
                out.append((i, n, mean_wl, alpha, stops, fail is None, fail))
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "n_tokens", "mean_word_len", "alpha_frac",
                    "stop_hits", "keep", "fail_reason",
                ],
            )

    return spread(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema
    )


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
    without shipping the text. One Arrow-batched ``mapInPandas`` sweep:
    ``re.subn`` counts and redacts each pattern in a single pass, so
    the corpus is scanned 3× total instead of the 6 regex passes
    (3 extract_all + 3 replace) the column-expression form costs —
    measured 27 s → Arrow at sf10 vs DuckDB's 3.6 s. No shuffle;
    linear scan at any scale. Counts are measured on the ORIGINAL text
    (redaction is sequential, counting is not), matching the SQL
    oracle; ``\\b``/``\\d`` compile under ``re.ASCII`` for Java/RE2
    parity.
    """
    import hashlib
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    from kamu_cli_spark.operators.util import spread

    pats = {n: _re.compile(p, _re.ASCII) for n, p in PII_PATTERNS.items()}
    schema = (
        f"{id_col} long, n_email int, n_ipv4 int, n_phone int, "
        "scrubbed_len int, scrubbed_md5 string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                s = txt or ""
                counts = []
                scrubbed = s
                for pat in pats.values():
                    counts.append(len(pat.findall(s)))
                    scrubbed = pat.sub(_REDACTION, scrubbed)
                out.append(
                    (
                        i,
                        *counts,
                        len(scrubbed),
                        hashlib.md5(scrubbed.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "n_email", "n_ipv4", "n_phone",
                    "scrubbed_len", "scrubbed_md5",
                ],
            )

    return spread(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema
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

    Exact-integer binning via the token count's bit length (the SQL
    form is ``length(bin(n))``) avoids float log2 edge cases at powers
    of two and is identical in Python, Spark, and DuckDB. Unlike
    ``ntile`` (a single-partition global sort), the bin id is a per-row
    value: the only shuffle is the final |bins|-group aggregate.

    The token count itself runs in an Arrow ``mapInPandas`` sweep (one
    ``\\s+`` split per doc) rather than the interpreted
    split-filter-size expression chain — the round's standing lesson
    for per-row text kernels (~2× at sf10 here). Scan-bound at any
    corpus size.
    """
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    from kamu_cli_spark.operators.util import spread

    ws_re = _re.compile(r"\s+", _re.ASCII)  # Java/RE2 \s parity

    def counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = [
                sum(1 for t in ws_re.split(txt or "") if t)
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": n,
                    # int.bit_length() == length(bin(n)) for n >= 1;
                    # bin(0) = '0' has length 1, so floor at 1
                    "len_bin": [max(1, x.bit_length()) for x in n],
                }
            )

    binned = spread(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        counts, f"{id_col} long, n_tokens int, len_bin int"
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
