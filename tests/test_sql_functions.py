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


# --- typed attribute parsing (reference AttributeUtilsSuite.scala) --------
def test_parse_attributes_suite_vectors():
    from adam_spark.functions.attributes import (
        Attribute,
        TagType,
        parse_attribute,
        parse_attributes,
    )
    import pytest as _pytest

    # :29 "parseTags returns a reasonable set of tagStrings"
    tags = parse_attributes("XT:i:3\tXU:Z:foo,bar")
    assert tags == [
        Attribute("XT", TagType.INTEGER, 3),
        Attribute("XU", TagType.STRING, "foo,bar"),
    ]
    # :43 NumericSequence tag types
    zz, zy, zx, zw = parse_attributes("zz:B:c,-1,1\tzy:B:s,-1,1\tzx:B:i,-1,1\tzw:B:f,-1.0,1.0")
    assert zz == Attribute("zz", TagType.NUMERIC_BYTE_SEQUENCE, [-1, 1])
    assert zy == Attribute("zy", TagType.NUMERIC_SHORT_SEQUENCE, [-1, 1])
    assert zx == Attribute("zx", TagType.NUMERIC_INT_SEQUENCE, [-1, 1])
    assert zw == Attribute("zw", TagType.NUMERIC_FLOAT_SEQUENCE, [-1.0, 1.0])
    # :64 empty string → no tags
    assert parse_attributes("") == []
    # :68 incorrectly formatted tag throws
    with _pytest.raises(ValueError):
        parse_attribute("XT:i")
    # :75/:81/:88 values may contain ':' and ','
    assert parse_attribute("XX:Z:foo:bar").value == "foo:bar"
    oq = "C55/15D:::::::.7GFFAFDA442.40F=AGHHE"
    assert parse_attribute(f"OQ:Z:{oq}").value == oq
    assert parse_attribute("OQ:Z:C," + oq).value == "C," + oq
    # :97 array tag without format throws
    with _pytest.raises(ValueError):
        parse_attribute("jI:B:1,2,3")
    # round-trip back to SAM text (Attribute.scala toString)
    assert str(zz) == "zz:B:c,-1,1"
    assert str(tags[0]) == "XT:i:3"


def test_attributes_map_and_tag_value(spark):
    from adam_spark.functions.attributes import attributes_from_map, tag_value
    from adam_spark.functions.attributes import Attribute, TagType
    from adam_spark.sources.sam import load_sam
    import pyspark.sql.functions as F

    assert attributes_from_map({"XT": "i:3"}) == [
        Attribute("XT", TagType.INTEGER, 3)
    ]
    # OQ with colons survives the loader's map encoding and the
    # Catalyst accessor strips only the type prefix
    sam = (
        "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n"
        "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII\tOQ:Z:C5:/,D=\tXT:i:3\n"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    p = os.path.join(d, "t.sam")
    open(p, "w").write(sam)
    df = load_sam(spark, p).df
    row = df.select(
        tag_value(F.col("attributes"), "OQ").alias("oq"),
        tag_value(F.col("attributes"), "XT").alias("xt"),
        F.col("attributes"),
    ).collect()[0]
    assert row["oq"] == "C5:/,D="
    assert row["xt"] == "3"
    assert attributes_from_map(row["attributes"]) == [
        Attribute("OQ", TagType.STRING, "C5:/,D="),
        Attribute("XT", TagType.INTEGER, 3),
    ] or attributes_from_map(row["attributes"]) == [
        Attribute("XT", TagType.INTEGER, 3),
        Attribute("OQ", TagType.STRING, "C5:/,D="),
    ]


def test_reverse_complement_alphabet_suite(spark):
    """AlphabetSuite.scala:94-110: case-insensitive complement
    (lowercase uppercases), unknown symbols pass through, and the full
    IUPAC 15-code table is its own complement set."""
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        reverse_complement(F.lit("atatcgcg")).alias("a"),
        reverse_complement(F.lit("ATATxcg")).alias("b"),
        reverse_complement(F.lit("atatcgcg"), alphabet="iupac").alias("c"),
        reverse_complement(F.lit("ACGTMRWSYKVHDBN"), alphabet="iupac").alias("d"),
    )
    r = df.collect()[0]
    assert r.a == "CGCGATAT"
    assert r.b == "CGxATAT"
    assert r.c == "CGCGATAT"
    assert r.d == "NVHDBMRSWYKACGT"
    register_functions(spark)
    row = spark.sql(
        "SELECT reverse_complement_iupac('ACGTMRWSYKVHDBN') d"
    ).collect()[0]
    assert row.d == "NVHDBMRSWYKACGT"
