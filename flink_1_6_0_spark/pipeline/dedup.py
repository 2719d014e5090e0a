"""Deduplication family for training-data pipelines (engine extension).

Five strategies, all shuffle-disciplined for 100 TB:

- exact            — hash-groupBy on content (1 shuffle on the hash)
- minhash + LSH    — shingle → minhash signature → band/bucket equi-join;
                     candidate pairs only ever meet inside a bucket, never
                     O(n²) (Broder '97; Leskovec/Rajaraman/Ullman ch.3)
- simhash          — per-doc 32-bit signature; near-dups share signature or
                     differ in few bits (Charikar '02)
- n-gram Jaccard   — exact verification on candidate sets (inverted-index
                     join, common-token counting — no cross join)
- embedding cosine — exact pair similarity over a vector column

Everything is Column-expression based (md5-derived hashing for oracle
parity — see pipeline.text.token_hash); no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_6_0_spark.pipeline.text import MOD, token_hash, tokenize

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the smallest-id row per distinct content; one hash shuffle.
    Emits (kept id, duplicate count) per group."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("kept_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def word_shingles(col: str | Column, k: int = 3) -> Column:
    """k-word shingles of the lowercased text → array<string> (distinct);
    empty array when the document has fewer than k tokens (no OOB access
    under ANSI mode)."""
    toks = tokenize(F.lower(col if isinstance(col, Column) else F.col(col)))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]))
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: h_i = min over shingles of (a_i·h(s) + b_i) mod P,
    with h(s) the portable md5 hash reduced mod P (< 2^30, so a_i·h + b_i
    stays exact in int64 in every engine)."""
    base = F.transform(shingles, lambda s: token_hash(s) % MOD)
    sig = [
        F.array_min(F.transform(base, lambda h: (h * (2 * i + 1) + i * 12_345 + 7) % MOD))
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Split the signature into bands and hash each band → array<struct<band,bh>>."""
    out = []
    for b in range(bands):
        parts = [F.element_at(sig, b * rows + r + 1) for r in range(rows)]
        band_hash = token_hash(F.concat_ws("_", *[p.cast("string") for p in parts])) % MOD
        out.append(F.struct(F.lit(b).alias("band"), band_hash.alias("bh")))
    return F.array(*out)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Plan shape (the 100 TB story): scan → per-doc signature (no shuffle) →
    explode to (band, bucket) → self equi-join on (band, bucket) → distinct
    pairs. The only shuffle keys are LSH buckets; no O(n²) comparison ever
    materializes. Skewed buckets (giant near-dup clusters) are handled by
    AQE skew-join splitting.
    """
    rows = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("doc"),
        lsh_bands(minhash_signature(word_shingles(text_col, shingle_k), num_hashes), bands, rows).alias("bands"),
    )
    buckets = sigs.select("doc", F.explode("bands").alias("b")).select(
        "doc", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    left = buckets.select(F.col("doc").alias("a"), "band", "bh")
    right = buckets.select(F.col("doc").alias("b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash(col: str | Column, bits: int = 32) -> Column:
    """SimHash signature: per-token portable hash; bit j of the result is 1
    iff sum over tokens of ±1 (sign of hash bit j) is positive."""
    toks = tokenize(F.lower(col if isinstance(col, Column) else F.col(col)))
    hashes = F.transform(toks, lambda t: token_hash(t))

    def bit_term(j: int):
        # pyspark dispatches higher-order-function lambdas on arity — keep 2-ary
        return lambda acc, h: acc + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)

    out = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), bit_term(j))
        out = out + F.when(bit_sum > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via inverted index — no cross join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for all pairs sharing ≥1
    shingle. Inverted-index self-join: |A∩B| from common-shingle counts,
    |A∪B| = |A|+|B|-|A∩B|. Shuffles on shingle then on pair — never O(n²)."""
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, k)).alias("shingle")
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns — JVM-side zip_with/
    aggregate, sequential accumulation (bit-identical to DuckDB's order)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """Exact pairwise cosine ≥ threshold. This is the verification kernel —
    at scale, run it per LSH bucket (similarity.lsh_ann) instead of globally;
    the global form here is the correctness baseline."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
