"""SQL function registry tests (closes the reference's §2.10 gap)."""

from adam_spark.functions import (
    gc_content,
    quality_string_to_phreds,
    register_functions,
    reverse_complement,
)


def test_register_and_use_sql_functions(spark):
    register_functions(spark)
    r = spark.sql(
        "SELECT reverse_complement('ACGTN') a, "
        "phred_to_error_probability(20.0) b, "
        "error_probability_to_phred(0.01) c, "
        "gc_content('ACGC') d, "
        "region_overlaps('c1', 1, 5, 'c1', 4, 9) e, "
        "region_overlaps('c1', 1, 5, 'c1', 5, 9) f"
    ).collect()[0]
    assert r.a == "NACGT"
    assert abs(r.b - 0.01) < 1e-12
    assert r.c == 20
    assert r.d == 0.75
    assert r.e is True and r.f is False


def test_column_builders(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        reverse_complement(F.lit("AACCGT")).alias("rc"),
        gc_content(F.lit("AACCGT")).alias("gc"),
        quality_string_to_phreds(F.lit("!I")).alias("ph"),
    )
    r = df.collect()[0]
    assert r.rc == "ACGGTT"
    assert abs(r.gc - 0.5) < 1e-12
    assert r.ph == [0, 40]
