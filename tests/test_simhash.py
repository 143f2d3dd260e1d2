"""SimHash signatures + hamming-banded near-dup pairs."""

import random

import pytest
from pyspark.sql import functions as F

from ontology_matcher_spark.operators.dedup import (
    SIMHASH_MAX_BITS,
    simhash,
    simhash_neardup_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(200)]
    rows = []
    for i in range(60):
        base = [rng.choice(vocab) for _ in range(60)]
        rows.append((i, " ".join(base)))
        if i % 3 == 0:  # near-duplicate: mutate one token
            mut = list(base)
            mut[7] = "zzz"
            rows.append((1000 + i, " ".join(mut)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_simhash(text: str, bits: int) -> int:
    """Independent reimplementation via Spark's own xxhash64 is not
    portable to pure Python, so equality is checked between the TWO
    Spark forms (column expr vs explode+agg), which share no code path
    beyond F.xxhash64 itself."""
    raise NotImplementedError


def test_signature_forms_agree(spark, corpus):
    bits = 16
    col_form = corpus.select(
        F.col("doc_id").alias("id"), simhash(F.col("text"), bits).alias("sim")
    )
    agg_form = simhash_signatures(corpus, bits=bits)
    a = {r["id"]: r["sim"] for r in col_form.collect()}
    b = {r["id"]: r["sim"] for r in agg_form.collect()}
    assert a == b


def test_default_bits_construct_and_run(spark, corpus):
    # 2**62 literal must not overflow long under ANSI mode
    out = simhash_signatures(corpus, bits=SIMHASH_MAX_BITS).collect()
    assert len(out) == corpus.count()
    assert all(r["sim"] >= 0 for r in out)


def test_bits_out_of_range_rejected(spark, corpus):
    with pytest.raises(ValueError):
        simhash(F.col("text"), bits=63)
    with pytest.raises(ValueError):
        simhash_signatures(corpus, bits=0)


def test_neardup_finds_mutated_docs(spark, corpus):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(
            corpus, n_blocks=4, max_hamming=3
        ).collect()
    }
    expected = {(i, 1000 + i) for i in range(0, 60, 3)}
    found = expected & set(got)
    # single-token mutation flips few sign-sums → low hamming distance;
    # banding recall is exact for pairs within max_hamming (pigeonhole)
    sigs = {r["id"]: r["sim"] for r in simhash_signatures(corpus).collect()}
    truly_close = {
        p for p in expected if bin(sigs[p[0]] ^ sigs[p[1]]).count("1") <= 3
    }
    assert truly_close, "fixture must produce close simhash pairs"
    assert truly_close <= set(got), "pigeonhole banding must have 100% recall"
    for (a, b), h in got.items():
        assert a < b
        assert h == bin(sigs[a] ^ sigs[b]).count("1")


def test_neardup_rejects_bad_blocks(spark, corpus):
    with pytest.raises(ValueError):
        simhash_neardup_pairs(corpus, n_blocks=3, max_hamming=3)
