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


def feature_terms(text: Column | str) -> Column:
    """Word unigrams + adjacent bigrams ("a_b") — the fastText
    feature set, built with array HOFs (no explode, no shuffle)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            lambda t, i: F.concat_ws("_", t, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_bucket(term: Column) -> Column:
    """md5-hashed 16-bit feature bucket — `conv(hex,16,10)` here,
    ``('0x' || hex)::INT`` in DuckDB: same value in both engines."""
    return F.conv(F.substring(F.md5(term), 1, 4), 16, 10).cast("long")


def bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight per bucket in [-500, 500] — the
    demo 'model'; arithmetic only, so any SQL engine reproduces it.
    A trained model replaces this with a weights lookup."""
    return (bucket * F.lit(_MIX)) % F.lit(_WEIGHT_MOD) - F.lit(500)


def _raw_score(terms: Column) -> Column:
    return F.aggregate(
        F.transform(terms, lambda t: bucket_weight(feature_bucket(t))),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )


def quality_keep(text: Column | str, threshold: float = 0.0) -> Column:
    """The classifier as a SCAN PREDICATE — a curation pipeline gates
    on the score inline (one codegen'd filter in the same stage as
    the read), it does not join against a scored table."""
    terms = feature_terms(text)
    score = _raw_score(terms).cast("double") / (
        F.lit(1000.0) * F.size(terms).cast("double")
    )
    return score >= F.lit(threshold)


def score_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """(id, n_features, raw_score, score, label): integer-fold the
    per-feature weights, normalize by 1000·n_features, keep/drop at
    the threshold.  Map-only plan — one codegen'd projection over the
    scan."""
    terms = feature_terms(text_col)
    raw = _raw_score(terms)
    n = F.size(terms)
    score = raw.cast("double") / (F.lit(1000.0) * n.cast("double"))
    # The projected score is fquant'd (integer round-trip) so the
    # driver-visible float is derived from identical integers on both
    # engines; keep/drop compares the unquantized value, mirroring
    # the oracle's CASE.
    from trafik_etl_modular_spark.functions.scalars import fquant

    return docs.select(
        F.col(id_col),
        n.alias("n_features"),
        raw.alias("raw_score"),
        fquant(score).alias("score"),
        F.when(score >= F.lit(threshold), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
