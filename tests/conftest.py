from __future__ import annotations

import pytest

from kamu_cli_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="kamu-cli-spark-tests", shuffle_partitions=8)
    yield spark


def rows(df, *order_cols):
    """Collect to a list of tuples, optionally sorted by given columns."""
    data = [tuple(r) for r in df.collect()]
    if order_cols:
        idx = [df.columns.index(c) for c in order_cols]
        data.sort(key=lambda t: tuple((t[i] is not None, t[i]) for i in idx))
    return data
