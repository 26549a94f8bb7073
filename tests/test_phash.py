from __future__ import annotations

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import multimodal
from mlops_pipelines_featurestore_gcp_spark.operators.dedup import hamming_blocked_pairs


def _payloads(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return multimodal.attach_payload(df, "text")


def test_perceptual_hash_deterministic_and_payload_keyed(spark):
    df = _payloads(spark, [(1, "same bytes"), (2, "same bytes"), (3, "other")])
    out = multimodal.perceptual_hash(df)
    got = {r.doc_id: r.phash for r in out.collect()}
    assert got[1] == got[2]  # identical payloads → identical hash
    assert got[1] != got[3]
    again = {r.doc_id: r.phash for r in multimodal.perceptual_hash(df).collect()}
    assert got == again
    # packs in a signed long with the documented bit budget
    assert all(0 <= h < (1 << multimodal.PHASH_BITS) for h in got.values())


def test_image_neardup_finds_exact_duplicates(spark):
    df = _payloads(
        spark,
        [(1, "aa"), (2, "aa"), (3, "bb"), (4, "bb"), (5, "unique payload")],
    )
    pairs = multimodal.image_neardup_pairs(df, "doc_id", max_hamming=0)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got == {(1, 2): 0, (3, 4): 0}


def test_hamming_blocking_pigeonhole_guarantee(spark):
    # hand-built 60-bit signatures: hamming(a,b)=2 (< chunks=4 → guaranteed
    # found), hamming(a,c)=30 (over max_hamming → excluded)
    a = (1 << 59) | 1
    b = a ^ 0b110  # flip 2 low bits
    c = a ^ ((1 << 30) - 1)  # flip 30 low bits
    sig = spark.createDataFrame([(1, a), (2, b), (3, c)], "id long, h long")
    pairs = hamming_blocked_pairs(sig, "id", "h", bits=60, chunks=4, max_hamming=8)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got == {(1, 2): 2}


def test_blocking_is_subset_of_allpairs_verify(spark):
    import itertools
    import random

    rnd = random.Random(7)
    sigs = [(i, rnd.getrandbits(60)) for i in range(40)]
    sig = spark.createDataFrame(sigs, "id long, h long")
    pairs = hamming_blocked_pairs(sig, "id", "h", bits=60, chunks=4, max_hamming=20)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    exact = {
        (i, j): bin(hi ^ hj).count("1")
        for (i, hi), (j, hj) in itertools.combinations(sigs, 2)
        if bin(hi ^ hj).count("1") <= 20
    }
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v == exact[k]
    # everything under the pigeonhole bound (hamming < 4) must be found
    must = {k for k, v in exact.items() if v < 4}
    assert must <= set(got)
