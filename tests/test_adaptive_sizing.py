"""Adaptive index-sizing formulas (no Spark needed): the exact integer
arithmetic must match what the SQL oracles compute, for every corpus
size — a mismatch would silently desynchronize the two engines."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamu_cli_spark.operators.similarity import adaptive_num_planes


def ceil_sqrt(n: int) -> int:
    r = math.isqrt(max(n, 1))
    return r if r * r == n else r + 1


@given(st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200)
def test_ceil_sqrt_exact(n):
    r = max(16, ceil_sqrt(n))
    assert (r - 1) ** 2 < n <= r * r or r == 16


@given(st.integers(min_value=2, max_value=10**12))
@settings(max_examples=200)
def test_num_planes_is_ceil_log2(n):
    p = adaptive_num_planes(n)
    assert p == max(4, math.ceil(math.log2(n))) or (
        # float log2 can disagree only at exact powers of two, where
        # bit_length is the exact answer
        n & (n - 1) == 0 and p == max(4, n.bit_length() - 1)
    )
    # defining property: smallest p with 2^p >= n (when above the floor)
    if p > 4:
        assert 2**p >= n and 2 ** (p - 1) < n


@pytest.mark.parametrize("n", [2, 3, 15, 16, 17, 199, 200, 256, 257, 2000, 20000, 200000])
def test_formulas_match_duckdb(n):
    """The SQL the oracles embed must yield identical counts."""
    con = duckdb.connect()
    cells, planes = con.execute(
        f"SELECT greatest(16, CAST(ceil(sqrt({n})) AS INT)),"
        f"       greatest(4, CAST(ceil(log2({n})) AS INT))"
    ).fetchone()
    assert cells == max(16, ceil_sqrt(n))
    assert planes == adaptive_num_planes(n)


def test_cached_count_memoizes_by_object_identity(spark):
    from kamu_cli_spark.operators.util import _COUNT_CACHE, cached_count

    a = spark.range(0, 123)
    assert cached_count(a) == 123
    assert cached_count(a) == 123  # hit
    assert id(a) in _COUNT_CACHE
    # a different object (even an identical plan) is its own entry —
    # identity keying is what makes the cache staleness-free
    b = spark.range(0, 123).filter("id < 10")
    assert cached_count(b) == 10
