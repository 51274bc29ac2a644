"""ANSI-mode contract gate.

The driver harness runs a stock Spark 4 session where
``spark.sql.ansi.enabled`` defaults to TRUE — casts of malformed
strings THROW instead of yielding null, ``element_at`` throws on
missing map keys / out-of-range array indices, and integer overflow
throws. The repo's dev session (adam_spark/session.py) runs ANSI-off
for permissive semantics, which r4 proved is NOT protection: a cast
that was fine in dev crashed ``mark_duplicates_orders`` in the driver.

This test executes (fully collects — count() alone would let Catalyst
prune the very columns whose casts can throw) EVERY contract query
under ANSI-on. Any new text→number ``.cast`` that should have been a
``try_cast`` fails here before it fails in the driver.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("ADAM_SPARK_ANSI_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """The session-wide SparkSession with ANSI flipped on for the
    duration of this module (runtime-settable SQL conf)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def _contract_query_names():
    import __spark_entry__ as entry

    return sorted(entry.queries().keys())


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata not present")
@pytest.mark.parametrize("name", _contract_query_names())
def test_contract_query_under_ansi(ansi_spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](ansi_spark, SF_DIR)
    rows = df.collect()  # full evaluation of every projected column
    assert rows is not None


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata not present")
def test_entry_under_ansi(ansi_spark):
    import __spark_entry__ as entry

    df = entry.entry(ansi_spark)
    assert df.collect() is not None
