"""Hashed linear text classifier — the fastText-shaped quality
filter (Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification"; the CCNet/web-corpus pipelines run exactly this
shape as their keep/drop quality gate).

Scale design: scoring is a PURE PER-ROW expression — features (word
unigrams + bigrams) are hashed into a bounded bucket space with md5
(same function in every engine, which is what makes the DuckDB oracle
exact), each bucket's weight is an INTEGER derived arithmetically,
and the document score is an integer fold normalized by one final
double division.  No shuffle, no UDF, no model broadcast needed for
the fixture-scale demo model; a TRAINED model swaps
:func:`bucket_weight` for a broadcast ``MapType`` literal (or a
join against a tiny weights table) with the identical plan shape —
map-only scan, whole-stage codegen, embarrassingly parallel at any
corpus size.

Integer-exact scoring (sum of integer weights; ONE final division)
is deliberate: partition-parallel double summation would make the
oracle comparison order-dependent, integer sums cannot (SURVEY §7.4
determinism rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 16  # 16-bit feature space: first 4 md5 hex digits
_MIX = 2654435761  # Knuth multiplicative-hash constant
_WEIGHT_MOD = 1001  # integer weights in [-500, 500]
_BIGRAM_MIX = 31  # bigram bucket = (b_a·31 + b_b) mod 2^16


def unigram_buckets(text: Column | str) -> Column:
    """One md5 per TOKEN → 16-bit bucket array.  Bigram buckets are
    DERIVED arithmetically from adjacent unigram buckets
    ((b_a·31 + b_b) mod 2¹⁶) instead of md5-ing the concatenated
    bigram string — that halves the md5 count and drops the per-pair
    string allocation (measured 2.6× on the scoring projection at
    sf0.1), with the identical hashed-feature semantics: fastText
    itself composes bigram ids from token ids the same way (Joulin et
    al. 2016, hashing trick).  `conv(hex,16,10)` here, ``('0x' ||
    hex)::BIGINT`` in DuckDB: same value in both engines."""
    c = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.split(c, " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"),
    )


def bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight per bucket in [-500, 500] — the
    demo 'model'; arithmetic only, so any SQL engine reproduces it.
    A trained model replaces this with a weights lookup."""
    return (bucket * F.lit(_MIX)) % F.lit(_WEIGHT_MOD) - F.lit(500)


def _raw_score_from_buckets(ub: Column) -> Column:
    """Integer fold of unigram + derived-bigram weights.  ``ub`` must
    be a BOUND value (a real column or a lambda variable), never an
    inline expression — inline expressions re-evaluate per reference
    (the shingles() gotcha) and this references ``ub`` four times."""
    n = F.size(ub)
    uni = F.aggregate(
        F.transform(ub, bucket_weight), F.lit(0).cast("long"), lambda a, w: a + w
    )
    len1 = F.greatest(n - 1, F.lit(0))
    big = F.when(
        n >= 2,
        F.aggregate(
            F.zip_with(
                F.slice(ub, 1, len1),
                F.slice(ub, 2, len1),
                lambda a, b: bucket_weight(
                    (a * F.lit(_BIGRAM_MIX) + b) % F.lit(N_BUCKETS)
                ),
            ),
            F.lit(0).cast("long"),
            lambda a, w: a + w,
        ),
    ).otherwise(F.lit(0).cast("long"))
    return uni + big


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` once and pass the VALUE into ``fn`` via the
    array-wrap trick (transform's lambda variable binds the evaluated
    element; an inline expression would re-evaluate per reference)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def quality_keep(text: Column | str, threshold: float = 0.0) -> Column:
    """The classifier as a SCAN PREDICATE — a curation pipeline gates
    on the score inline (one codegen'd filter in the same stage as
    the read), it does not join against a scored table."""
    return _bind(
        unigram_buckets(text),
        lambda u: _raw_score_from_buckets(u).cast("double")
        / (F.lit(1000.0) * (F.lit(2) * F.size(u) - 1).cast("double"))
        >= F.lit(threshold),
    )


def score_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """(id, n_features, raw_score, score, label): integer-fold the
    per-feature weights, normalize by 1000·n_features, keep/drop at
    the threshold.  Map-only plan — two stacked projections over the
    scan (the bucket array is an aliased child column so the
    expensive md5 transform evaluates once; CollapseProject keeps
    non-cheap aliased expressions un-inlined)."""
    # The projected score is fquant'd (integer round-trip) so the
    # driver-visible float is derived from identical integers on both
    # engines; keep/drop compares the unquantized value, mirroring
    # the oracle's CASE.
    from trafik_etl_modular_spark.functions.scalars import fquant

    staged = docs.select(
        F.col(id_col), unigram_buckets(text_col).alias("__ub")
    ).select(
        F.col(id_col),
        (F.lit(2) * F.size("__ub") - 1).cast("int").alias("n_features"),
        _raw_score_from_buckets(F.col("__ub")).alias("raw_score"),
    )
    score = F.col("raw_score").cast("double") / (
        F.lit(1000.0) * F.col("n_features").cast("double")
    )
    return staged.select(
        F.col(id_col),
        "n_features",
        "raw_score",
        fquant(score).alias("score"),
        F.when(score >= F.lit(threshold), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
