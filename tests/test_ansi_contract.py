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


def test_driver_window_invariants():
    """The correctness driver records only the FIRST 50 queries()
    entries and hash-compares each against its oracle_sql() — so every
    in-window query MUST have an oracle (a rows-only query in a window
    slot silently weakens the gate), every oracle key must name a real
    query, and dict order must be intentional (this test fails loudly
    if an insertion accidentally reorders the window)."""
    import __spark_entry__ as entry

    q = list(entry.queries())
    o = entry.oracle_sql()
    in_window = q[:50]
    missing = [k for k in in_window if k not in o]
    assert missing == [], f"in-window queries without oracle: {missing}"
    unknown = [k for k in o if k not in q]
    assert unknown == [], f"oracle keys not in queries(): {unknown}"
    # the documented rows-only entries stay parked past the cap
    for rows_only in ("pipe_features_cat", "multimodal_features",
                      "ann_ivf_topk_quantized_kmeans"):
        assert rows_only in q, rows_only
        assert q.index(rows_only) >= 50, f"{rows_only} must stay parked"
        assert rows_only not in o
    # r8 rotation pins: quantized IVF (deterministic centroids) is
    # in-window WITH an exact oracle; float IVF parks with its r6+r7
    # driver history but keeps its oracle for capless check_oracle runs
    assert q.index("ann_ivf_topk_quantized") < 50
    assert "ann_ivf_topk_quantized" in o
    assert q.index("ann_ivf_topk") >= 50 and "ann_ivf_topk" in o
    # r7 rotation pins: the one never-driver-recorded oracle query is in
    # the window; its parked exchange partner keeps a family mirror
    assert q.index("semantic_dedup_embeddings") < 50
    assert q.index("interval_join_inner") < 50  # family representative
    # r12 rotation pins: right_outer and coverage_downsample promoted
    # for driver-recorded rows; their 7-round-green exchange partners
    # park with in-window family mirrors (inner joins, coverage_binned)
    assert q.index("interval_join_right_outer") < 50
    assert q.index("coverage_downsample") < 50
    assert q.index("interval_join_flank_broadcast") >= 50
    assert "interval_join_flank_broadcast" in o
    assert q.index("coverage_from_reads") >= 50 and "coverage_from_reads" in o
    assert q.index("coverage_binned") < 50  # family representative
