"""Document deduplication at corpus scale.

Four strategies, in increasing tolerance of variation:

  * exact          — md5 content hash, groupBy (one shuffle of hashes)
  * n-gram Jaccard — shingle-set similarity on candidate pairs
  * MinHash + LSH  — sketch shingles → band-bucket join → verify;
                     the scale path: candidate generation is a
                     shuffle on (band, bucket-hash) keys, NEVER an
                     all-pairs product
  * SimHash        — 64-bit near-dup signature, bucket on rotated
                     prefixes (Hamming-distance candidates)

All sketching is JVM-side (xxhash64 + higher-order array functions).
Published algorithm references: Broder 1997 (MinHash), Charikar 2002
(SimHash), Leskovec/Rajaraman/Ullman "Mining of Massive Datasets"
ch.3 (banding).  MinHash/SimHash signatures are engine-specific
(xxhash64 seeds), so their queries are rows-only checked by the
driver and cross-validated against exact Jaccard in tests/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles via 1-based element_at (mirrors the
    SQL oracle's 1-based list indexing exactly)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(k)]  # noqa: E731
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", *parts(i)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| on distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingle_arr: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature: for seed s, the signature
    element is min over shingles of xxhash64(shingle, seed=s).

    Implemented as a transform over seeds of array_min(transform(
    shingles, xxhash64)) — all Catalyst, no UDF; cost O(|shingles| ×
    num_hashes) per doc, embarrassingly parallel."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(F.transform(shingle_arr, lambda sh: F.xxhash64(sh, s))),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signature, bucket-join docs sharing any band hash.

    bands × rows_per_band must equal the signature width.  With b=16,
    r=4 the S-curve threshold is (1/b)^(1/r) ≈ 0.50 Jaccard.  The
    join is an equi-join on (band_idx, band_hash): Spark shuffles both
    sides on that key — candidate generation scales with bucket
    occupancy, not corpus².  Output: distinct (id_a, id_b), id_a < id_b.
    """
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band),
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band → candidate
    join → exact-Jaccard verify on candidates only.

    The verify re-joins shingle sets for candidate ids — at corpus
    scale candidates are a tiny fraction of pairs, so the expensive
    array_intersect runs on ~linear volume."""
    rows_per_band = num_hashes // bands
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    # The shingle arrays and signatures feed three plan legs (two join
    # sides + verify); checkpoint so the expensive expressions are
    # computed once, not once per leg. At lake scale this is a persist
    # to storage between the sketch and join stages.
    sh = sh.localCheckpoint(eager=False)
    signed = sh.withColumn(
        "minhash", minhash_signature(F.col("sh"), num_hashes)
    ).localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(signed, id_col, "minhash", bands, rows_per_band)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(hash_arr: Column) -> Column:
    """64-bit SimHash over a pre-hashed token array: per bit i, sum
    ±1 votes according to bit i of each token hash; the vote's sign
    sets bit i of the signature.

    Expressed as per-bit aggregate() over the hash array (pure
    Catalyst). Token hashes are computed ONCE upstream — the 64 bit
    lanes reuse them."""

    def bit_vote(i):
        return F.aggregate(
            hash_arr,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.lit(-(2**63)) if i == 63 else F.lit(2**i).cast("long")
        sig = sig + F.when(bit_vote(i) > 0, bit).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Doc → 64-bit simhash (distinct tokens, hashed once).  Bucketing
    for Hamming-distance candidate pairs: split the signature into
    4 × 16-bit chunks; near-dups (Hamming ≤ 3) must share at least one
    chunk (pigeonhole), so an equi-join on (chunk_idx, chunk_value)
    finds all of them with one shuffle."""
    hashes = F.transform(
        F.array_distinct(F.split(F.col(text_col), " ")), lambda tok: F.xxhash64(tok)
    )
    return docs.select(F.col(id_col), simhash64(hashes).alias("simhash"))


def simhash_candidate_pairs(signed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pigeonhole bucket join on 16-bit signature chunks."""
    chunked = signed.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("chunk_idx", "chunk_val"),
    )
    l, r = chunked.alias("l"), chunked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sig_a"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.withColumn("hamming", hamming)
