"""Coverage family: events-method vs literal per-base explode oracle,
collapse/flatten round trips, binned aggregation."""

from collections import defaultdict

from pyspark.sql import functions as F

from adam_spark.operators.coverage import (
    aggregated_coverage,
    collapse_coverage,
    downsample_coverage,
    flatten_coverage,
    to_coverage,
)


def _perbase_dict(rows):
    d = defaultdict(float)
    for r in rows:
        d[(r["referenceName"], r["start"], r["optSampleId"])] += 0  # keys exist
        d[(r["referenceName"], r["start"], r["optSampleId"])] = r["count"]
    return dict(d)


def test_events_equals_explode(fixtures):
    aln = fixtures.alignments().df
    ev = to_coverage(aln, collapse=False, method="events")
    ex = to_coverage(aln, collapse=False, method="explode")
    assert _perbase_dict(ev.collect()) == _perbase_dict(ex.collect())


def test_events_by_sample(fixtures):
    aln = fixtures.alignments().df
    ev = to_coverage(aln, collapse=False, by_sample=True, method="events")
    ex = to_coverage(aln, collapse=False, by_sample=True, method="explode")
    assert _perbase_dict(ev.collect()) == _perbase_dict(ex.collect())


def test_collapsed_flatten_roundtrip(fixtures):
    aln = fixtures.alignments().df
    collapsed = to_coverage(aln, collapse=True, method="events")
    flat = flatten_coverage(collapsed)
    perbase = to_coverage(aln, collapse=False, method="explode")
    assert _perbase_dict(flat.collect()) == _perbase_dict(perbase.collect())
    # collapsed intervals are maximal: no two adjacent intervals share a count
    rows = sorted(
        collapsed.collect(), key=lambda r: (r["referenceName"] or "", r["optSampleId"] or "", r["start"])
    )
    for a, b in zip(rows, rows[1:]):
        if (a["referenceName"], a["optSampleId"]) == (b["referenceName"], b["optSampleId"]):
            assert not (a["end"] == b["start"] and a["count"] == b["count"])


def test_collapse_fixture_coverage(fixtures):
    cov = fixtures.coverage().df
    collapsed = collapse_coverage(cov)
    # total covered base-count mass is preserved
    mass = cov.select(F.sum((F.col("end") - F.col("start")) * F.col("count"))).first()[0]
    cmass = collapsed.select(F.sum((F.col("end") - F.col("start")) * F.col("count"))).first()[0]
    assert mass == cmass
    assert collapsed.count() <= cov.count()


def test_aggregated_coverage_matches_flatten(fixtures):
    cov = fixtures.coverage().df.where(F.col("optSampleId") == "sampleA")
    got = {
        (r["referenceName"], r["start"]): r["count"]
        for r in aggregated_coverage(cov, 100).collect()
    }
    flat = flatten_coverage(cov).collect()
    agg = defaultdict(list)
    for r in flat:
        agg[(r["referenceName"], r["start"] // 100 * 100)].append(r["count"])
    want = {k: sum(v) / len(v) for k, v in agg.items()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_downsample(fixtures):
    cov = fixtures.coverage().df
    ds = downsample_coverage(cov, 50)
    assert ds.where(F.col("start") % 50 != 0).count() == 0
