"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none).

Pure-Python properties run hundreds of random cases; Spark-backed
properties batch many random rows into a single job per example with a
small example budget.
"""

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from adam_spark.functions import cigar as C

BASES = "ACGT"


# --- CIGAR/MD round-trip properties (pure python, fast) -------------------

seq_st = st.text(alphabet=BASES, min_size=1, max_size=60)


@given(st.data())
@settings(max_examples=200, deadline=None)
def test_md_roundtrip_recovers_reference(data):
    """md_from_reference ∘ reference_from_read == identity on the
    reference slice, for reads with matches/mismatches/deletions."""
    rng = random.Random(data.draw(st.integers(0, 2**32)))
    ref = "".join(rng.choice(BASES) for _ in range(rng.randint(5, 60)))
    # build a read aligned at 0: point mutations + optional deletion
    n_del = rng.randint(0, 1) if len(ref) > 10 else 0
    if n_del:
        dpos = rng.randint(2, len(ref) - 4)
        dlen = rng.randint(1, 2)
        read = list(ref[:dpos] + ref[dpos + dlen :])
        cigar = f"{dpos}M{dlen}D{len(ref) - dpos - dlen}M"
    else:
        read = list(ref)
        cigar = f"{len(ref)}M"
    for i in range(len(read)):
        if rng.random() < 0.15:
            read[i] = rng.choice(BASES.replace(read[i], ""))
    read = "".join(read)

    md, n_mm = C.md_from_reference(cigar, read, ref)
    assert n_mm == sum(
        1
        for ab in C.aligned_pairs(cigar, 0)
        if read[ab.read_idx] != ref[ab.ref_pos]
    )
    recovered = C.reference_from_read(cigar, md, read)
    assert recovered == ref


@given(st.data())
@settings(max_examples=200, deadline=None)
def test_left_align_preserves_lengths(data):
    """left_align_indel never changes read length or reference span."""
    rng = random.Random(data.draw(st.integers(0, 2**32)))
    read_len = rng.randint(6, 40)
    seq = "".join(rng.choice(BASES) for _ in range(read_len))
    kind = rng.choice(["I", "D", "none"])
    if kind == "I":
        m1 = rng.randint(1, read_len - 3)
        ilen = rng.randint(1, min(3, read_len - m1 - 1))
        m2 = read_len - m1 - ilen
        cigar = f"{m1}M{ilen}I{m2}M"
        md = None
    elif kind == "D":
        m1 = rng.randint(1, read_len - 2)
        dlen = rng.randint(1, 3)
        m2 = read_len - m1
        cigar = f"{m1}M{dlen}D{m2}M"
        md = f"{m1}^{''.join(rng.choice(BASES) for _ in range(dlen))}{m2}"
    else:
        cigar = f"{read_len}M"
        md = str(read_len)
    out = C.left_align_indel(cigar, seq, md)
    assert C.cigar_read_length(out) == C.cigar_read_length(cigar)
    assert C.cigar_reference_length(out) == C.cigar_reference_length(cigar)


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_aligned_pairs_monotone(data):
    """aligned_pairs is strictly increasing in both coordinates."""
    rng = random.Random(data.draw(st.integers(0, 2**32)))
    parts = []
    for _ in range(rng.randint(1, 6)):
        parts.append(f"{rng.randint(1, 9)}{rng.choice('MIDNS')}")
    cigar = "".join(parts)
    pairs = C.aligned_pairs(cigar, rng.randint(0, 1000))
    for a, b in zip(pairs, pairs[1:]):
        assert b.read_idx > a.read_idx
        assert b.ref_pos > a.ref_pos


# --- Spark-backed properties (few examples, big batches) ------------------


@pytest.mark.usefixtures("spark")
@given(seed=st.integers(0, 2**31))
@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
def test_region_join_equals_naive(spark, seed):
    """Binned region_join == cross join + overlap predicate, on random
    interval sets (the §2.4 correctness property)."""
    from adam_spark.operators.region_join import region_join
    import pyspark.sql.functions as F

    rng = random.Random(seed)
    def gen(n, tag):
        rows = []
        for i in range(n):
            ref = f"c{rng.randint(0, 2)}"
            s = rng.randint(0, 500)
            e = s + rng.randint(1, 80)
            rows.append((ref, s, e, f"{tag}{i}"))
        return spark.createDataFrame(
            rows, "referenceName string, start long, end long, id string"
        )

    l, r = gen(120, "l"), gen(150, "r")
    flank = rng.choice([0, 10])
    joined = region_join(l, r, how="inner", flank=flank, bin_size=rng.choice([16, 64, 1000]))
    got = {(x["id"], x["id_r"]) for x in joined.collect()}
    la, rb = l.alias("a"), r.alias("b")
    naive = (
        la.crossJoin(rb)
        .where(
            (F.col("a.referenceName") == F.col("b.referenceName"))
            & (F.col("a.start") - flank < F.col("b.end"))
            & (F.col("b.start") < F.col("a.end") + flank)
        )
        .select(F.col("a.id").alias("x"), F.col("b.id").alias("y"))
    )
    want = {(x["x"], x["y"]) for x in naive.collect()}
    assert got == want


@pytest.mark.usefixtures("spark")
@given(seed=st.integers(0, 2**31))
@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
def test_coverage_depth_equals_bruteforce(spark, seed):
    """events-method coverage == per-base brute force on random reads."""
    from adam_spark.operators.coverage import to_coverage, flatten_coverage
    import collections

    rng = random.Random(seed)
    rows = []
    truth = collections.Counter()
    for i in range(200):
        s = rng.randint(0, 300)
        e = s + rng.randint(1, 50)
        rows.append(("c1", s, e, True, None))
        for p in range(s, e):
            truth[p] += 1
    df = spark.createDataFrame(
        rows,
        "referenceName string, start long, end long, readMapped boolean, readGroupSampleId string",
    )
    cov = to_coverage(df, collapse=False)
    got = {r["start"]: r["count"] for r in cov.collect()}
    assert got == {p: float(c) for p, c in truth.items()}


# --- container codec properties (pure python, fast) -----------------------


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_itf8_roundtrip(v):
    from adam_spark.sources.cram import itf8_decode, itf8_encode

    e = itf8_encode(v)
    d, off = itf8_decode(e, 0)
    assert (d, off) == (v, len(e))


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_ltf8_roundtrip(v):
    from adam_spark.sources.cram import ltf8_decode, ltf8_encode

    e = ltf8_encode(v)
    d, off = ltf8_decode(e, 0)
    assert (d, off) == (v, len(e))


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_bam_record_codec_random_fields(data):
    """SAM line → BAM record → SAM line is identity for random reads
    with random typed tags (the §5 codec-parity bar, randomized)."""
    from adam_spark.sources.bam import _record_to_sam_line, sam_line_to_bam_record

    rng = random.Random(data.draw(st.integers(0, 2**32)))
    n = rng.randrange(1, 40)
    seq = "".join(rng.choice(BASES) for _ in range(n))
    qual = "".join(chr(33 + rng.randrange(0, 60)) for _ in range(n))
    cig_ops = []
    left = n
    while left > 0:
        take = rng.randrange(1, left + 1)
        cig_ops.append(f"{take}{rng.choice('MIS=X')}")
        left -= take
    if rng.random() < 0.3:
        cig_ops.insert(rng.randrange(len(cig_ops) + 1), f"{rng.randrange(1, 9)}D")
    cigar = "".join(cig_ops)
    tags = []
    if rng.random() < 0.7:
        tags.append(f"NM:i:{rng.randrange(-100, 1000)}")
    if rng.random() < 0.5:
        tags.append(f"XZ:Z:{''.join(rng.choice('abcXYZ') for _ in range(rng.randrange(0, 9)))}")
    if rng.random() < 0.3:
        tags.append("XB:B:S," + ",".join(str(rng.randrange(0, 65536)) for _ in range(3)))
    if rng.random() < 0.3:
        tags.append(f"XA:A:{rng.choice('acgtn')}")
    fields = [
        f"r{rng.randrange(1000)}", str(rng.choice([0, 16, 99, 147, 83, 163])),
        "chr1", str(rng.randrange(1, 100000)), str(rng.randrange(0, 61)),
        cigar, "*", "0", "0", seq, qual,
    ] + tags
    line = "\t".join(fields)
    rec = sam_line_to_bam_record(line, {"chr1": 0})
    back = _record_to_sam_line(rec[4:], ["chr1"])
    # aux int types normalize (i stays i); B:S values round-trip exactly
    assert back == line


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_reference_coded_cram_record_roundtrip(data):
    """Random mapped records (substitutions, indels, clips, skips) must
    round-trip bit-exactly through the RR=true container codec, and the
    decoder's reference-position tracking must survive every op mix."""
    from adam_spark.sources import cram as cm

    rng = random.Random(data.draw(st.integers(0, 2**31)))
    contig = "".join(rng.choice("ACGT") for _ in range(500))
    ref_seqs = {"c1": contig}

    lines = []
    for ri in range(data.draw(st.integers(1, 6))):
        start = rng.randrange(0, 300)
        ops = []
        if rng.random() < 0.3:
            ops.append((rng.randrange(1, 5), "S"))
        n_mid = rng.randrange(1, 5)
        for j in range(n_mid):
            op = rng.choice("MMMIDN")
            ops.append((rng.randrange(1, 12), op))
        if ops[-1][1] in "DN":
            ops.append((rng.randrange(1, 8), "M"))
        if ops[0][1] in "DN":
            ops = [(rng.randrange(1, 8), "M")] + ops
        if rng.random() < 0.3:
            ops.append((rng.randrange(1, 5), "S"))
        seq = []
        ref_pos = start
        for n, op in ops:
            if op == "M":
                for i in range(n):
                    base = contig[(ref_pos + i) % len(contig)]
                    if rng.random() < 0.15:  # substitution
                        base = {"A": "C", "C": "G", "G": "T", "T": "A"}[base]
                    seq.append(base)
                ref_pos += n
            elif op in "IS":
                seq.extend(rng.choice("ACGT") for _ in range(n))
            else:  # D, N
                ref_pos += n
        cigar = "".join(f"{n}{op}" for n, op in ops)
        s = "".join(seq)
        q = "".join(chr(33 + rng.randrange(0, 40)) for _ in s)
        lines.append(f"p{ri}\t0\tc1\t{start + 1}\t60\t{cigar}\t*\t0\t0\t{s}\t{q}")

    for ref in (None, ref_seqs):
        out = bytearray()
        cm._write_data_container(out, lines, {"c1": 0}, 0, "gzip", ref)
        hdr = cm._read_container_header(out, 0)
        got = cm.decode_container(out, 0, hdr, ["c1"], ref)
        assert len(got) == len(lines)
        for want, have in zip(lines, got):
            assert have.split("\t")[:11] == want.split("\t")[:11], (ref is not None, want, have)


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_cram_core_codecs_roundtrip(data):
    """Random symbol streams encoded with test-side writers decode
    exactly through the module's codec objects (canonical HUFFMAN,
    BETA, GAMMA, SUBEXP) — the read path a foreign CRAM exercises."""
    from adam_spark.sources.cram import (
        _BitReader,
        _BetaCodec,
        _GammaCodec,
        _HuffmanCodec,
        _SubexpCodec,
    )

    class BW:
        def __init__(self):
            self.buf, self.acc, self.n = bytearray(), 0, 0

        def write(self, v, nbits):
            for i in range(nbits - 1, -1, -1):
                self.acc = (self.acc << 1) | ((v >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    self.acc, self.n = 0, 0

        def getvalue(self):
            out = bytes(self.buf)
            if self.n:
                out += bytes((self.acc << (8 - self.n),))
            return out

    class FakeCursors:
        def __init__(self, core):
            self.core = _BitReader(core)

    kind = data.draw(st.sampled_from(["huffman", "beta", "gamma", "subexp"]))
    bw = BW()
    if kind == "huffman":
        symbols = data.draw(
            st.lists(
                st.integers(-100, 10_000), min_size=2, max_size=12, unique=True
            )
        )
        # canonical code lengths: derive from a shuffled balanced tree by
        # assigning lengths that satisfy Kraft equality (complete code)
        n = len(symbols)
        lengths = []
        rem = 1.0
        for i in range(n):
            if i == n - 1:
                ln = max(1, round(-__import__("math").log2(rem)))
            else:
                ln = data.draw(
                    st.integers(
                        max(1, int(-__import__("math").log2(rem)) + 1),
                        min(14, int(-__import__("math").log2(rem / (n - i))) + 2),
                    )
                )
            ln = max(1, min(14, ln))
            while 2.0 ** -ln > rem:
                ln += 1
            lengths.append(ln)
            rem -= 2.0 ** -ln
        # sort (length, idx) canonically the same way the codec does and
        # compute each symbol's code to drive the encoder
        codec = _HuffmanCodec(symbols, lengths)
        inv = {sym: (ln, code) for (ln, code), sym in codec.codes.items()}
        values = data.draw(
            st.lists(st.sampled_from(symbols), min_size=1, max_size=50)
        )
        for v in values:
            ln, code = inv[v]
            bw.write(code, ln)
    elif kind == "beta":
        offset = data.draw(st.integers(0, 100))
        nbits = data.draw(st.integers(1, 24))
        codec = _BetaCodec(offset, nbits)
        values = data.draw(
            st.lists(
                st.integers(-offset, (1 << nbits) - 1 - offset),
                min_size=1,
                max_size=50,
            )
        )
        for v in values:
            bw.write(v + offset, nbits)
    elif kind == "gamma":
        offset = data.draw(st.integers(0, 10))
        codec = _GammaCodec(offset)
        values = data.draw(
            st.lists(st.integers(1 - offset, 100_000), min_size=1, max_size=50)
        )
        for v in values:
            x = v + offset
            nb = x.bit_length()
            bw.write(0, nb - 1)  # unary zeros
            bw.write(x, nb)  # leading 1 + remainder
    else:  # subexp
        offset = data.draw(st.integers(0, 10))
        k = data.draw(st.integers(1, 8))
        codec = _SubexpCodec(offset, k)
        values = data.draw(
            st.lists(st.integers(-offset, 100_000), min_size=1, max_size=50)
        )
        for v in values:
            x = v + offset
            if x < (1 << k):
                bw.write(0, 1)
                bw.write(x, k)
            else:
                count = x.bit_length() - k
                bw.write((1 << count) - 1, count)  # unary ones
                bw.write(0, 1)
                bw.write(x - (1 << (count + k - 1)), count + k - 1)
    c = FakeCursors(bw.getvalue())
    got = [codec.read_int(c) for _ in values]
    assert got == values


# --- LLM packing / sampling invariants (pure python vs Spark) -------------


@given(seed=st.integers(0, 2**31), ctx=st.integers(8, 64))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_invariants(spark, seed, ctx):
    """Packed layout is gapless per stratum: each doc starts exactly
    where its predecessor's tokens end, offsets stay inside the
    context, and pack indices never decrease in id order."""
    from adam_spark.llm.packing import pack_sequences

    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(5, 60)):
        src = f"s{rng.randint(0, 3)}"
        text = " ".join("w%d" % rng.randint(0, 9) for _ in range(rng.randint(0, 30)))
        rows.append((i, src, text))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = sorted(
        ((r["stratum"], r["id"], r["n_tokens"], r["start_pack"], r["start_offset"], r["end_pack"])
         for r in pack_sequences(df, ctx, "source").collect())
    )
    pos = {}
    for stratum, _id, ntok, sp, so, ep in got:
        before = pos.get(stratum, 0)
        assert sp == before // ctx
        assert so == before % ctx
        assert ep == (before + max(ntok - 1, 0)) // ctx
        assert 0 <= so < ctx
        assert ep >= sp
        pos[stratum] = before + ntok


@given(seed=st.integers(0, 2**31), frac=st.floats(0.0, 1.0))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hash_sample_is_stable_subset(spark, seed, frac):
    """hash_sample(f1) ⊆ hash_sample(f2) when f1 ≤ f2 (thresholding one
    fixed hash), and the test split of train_test_split is exactly the
    sample at the same fraction/seed."""
    from adam_spark.llm.sampling import hash_sample, train_test_split

    rng = random.Random(seed)
    ids = list({rng.randint(0, 10**6) for _ in range(80)})
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    s = str(seed)
    small = {r["doc_id"] for r in hash_sample(df, frac / 2, "doc_id", seed=s).collect()}
    big = {r["doc_id"] for r in hash_sample(df, frac, "doc_id", seed=s).collect()}
    assert small <= big
    tst = {
        r["doc_id"]
        for r in train_test_split(df, frac, "doc_id", seed=s).where("split = 'test'").collect()
    }
    assert tst == big


@given(seed=st.integers(0, 2**31))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_partitions_token_stream(spark, seed):
    """For any corpus and any (chunk_tokens, overlap): every chunk is
    ≤ chunk_tokens long, consecutive chunks of a doc overlap by exactly
    ``overlap`` tokens (except a shorter tail), and stride-concatenation
    reproduces the document's token stream."""
    from adam_spark.llm.text import chunk_documents

    rng = random.Random(seed)
    ct = rng.randint(2, 12)
    ov = rng.randint(0, ct - 1)
    rows = []
    for i in range(25):
        n = rng.randint(0, 40)
        rows.append((i, " ".join(rng.choice("abcdefg") * rng.randint(1, 3) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=ct, overlap=ov).collect():
        got.setdefault(r["id"], {})[r["chunk_index"]] = r["chunk"].split(" ")
    stride = ct - ov
    for i, text in rows:
        toks = [t for t in text.split(" ") if t]
        chunks = got.get(i, {})
        if not toks:
            assert chunks == {}
            continue
        assert sorted(chunks) == list(range(len(chunks)))
        rebuilt = []
        for k in range(len(chunks)):
            c = chunks[k]
            assert len(c) <= ct
            assert c == toks[k * stride : k * stride + ct]
            rebuilt.extend(c[:stride] if k < len(chunks) - 1 else c)
        # stride-concatenation covers the stream exactly once
        assert rebuilt[: len(toks)] == toks


@given(seed=st.integers(0, 2**31))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_remove_repeated_spans_properties(spark, seed):
    """For any corpus: above-corpus-size thresholds are the identity;
    min_docs=1 removes every non-empty span; kept text is always a
    subsequence of the original spans; n_removed sums match."""
    from adam_spark.llm.dedup import remove_repeated_spans

    rng = random.Random(seed)
    vocab = ["lorem", "ipsum", "dolor", "sit", "amet"]
    rows = []
    for i in range(20):
        n = rng.randint(0, 6)
        rows.append((i, "\n".join(rng.choice(vocab) for _ in range(n)) if n else ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ident = {r["doc_id"]: r for r in remove_repeated_spans(df, min_docs=len(rows) + 1).collect()}
    for i, text in rows:
        assert ident[i]["text_clean"] == text and ident[i]["n_removed"] == 0
    nuke = {r["doc_id"]: r for r in remove_repeated_spans(df, min_docs=1).collect()}
    for i, text in rows:
        spans = text.split("\n")
        nonempty = [s for s in spans if s.strip()]
        assert nuke[i]["n_removed"] == len(nonempty)
        assert nuke[i]["text_clean"] == "\n".join(s for s in spans if not s.strip())
    mid = {r["doc_id"]: r for r in remove_repeated_spans(df, min_docs=3).collect()}
    for i, text in rows:
        spans = text.split("\n")
        kept = mid[i]["text_clean"].split("\n") if mid[i]["text_clean"] != "" else []
        # kept spans are an in-order subsequence of the originals
        it = iter(spans)
        assert all(any(s == t for t in it) for s in kept)
        assert mid[i]["n_removed"] + len(kept) == len(spans) or (
            text == "" and mid[i]["n_removed"] == 0
        )


@given(st.data())
@settings(max_examples=200, deadline=None)
def test_attribute_parse_roundtrip(data):
    """str(parse_attribute(s)) == s for every well-formed SAM tag the
    grammar admits (AttributeUtils regex surface)."""
    from adam_spark.functions.attributes import parse_attribute

    tag = data.draw(
        st.text(
            st.characters(
                min_codepoint=33, max_codepoint=126, exclude_characters=":\t"
            ),
            min_size=2, max_size=4,
        )
    )
    kind = data.draw(st.sampled_from("AifZB"))
    if kind == "A":
        value = data.draw(
            st.characters(min_codepoint=33, max_codepoint=126)
        )
        encoded = f"{tag}:A:{value}"
    elif kind == "i":
        value = data.draw(st.integers(-2**31, 2**31 - 1))
        encoded = f"{tag}:i:{value}"
    elif kind == "f":
        # repr-stable floats only: round-trip is str(float(x)) == x
        value = data.draw(st.floats(allow_nan=False, allow_infinity=False))
        encoded = f"{tag}:f:{value}"
    elif kind == "Z":
        value = data.draw(
            st.text(
                st.characters(min_codepoint=32, max_codepoint=126,
                              exclude_characters="\t"),
                max_size=30,
            )
        )
        encoded = f"{tag}:Z:{value}"
    else:
        fmt = data.draw(st.sampled_from("csiCSI"))
        vals = data.draw(st.lists(st.integers(-100, 100), min_size=1, max_size=8))
        encoded = f"{tag}:B:{fmt}," + ",".join(str(v) for v in vals)
    att = parse_attribute(encoded)
    assert att.tag == tag
    if kind == "f":
        assert str(att) == f"{tag}:f:{float(f'{value}')}"
    else:
        assert str(att) == encoded
