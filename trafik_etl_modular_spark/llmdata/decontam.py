"""Benchmark decontamination — n-gram overlap between a training
corpus and an evaluation/benchmark set.

Standard LLM-data hygiene step (published form: GPT-3 appendix C /
PaLM / Llama data papers — remove training documents sharing long
n-grams with eval benchmarks).  Semantics here:

  * both sides are reduced to DISTINCT word k-shingles
    (:func:`trafik_etl_modular_spark.llmdata.dedup.shingles` — pure
    Catalyst higher-order functions, no UDF);
  * a train document's ``contamination`` is the fraction of its
    distinct k-grams that appear anywhere in the eval set;
  * ``contaminated`` flags documents at/above a threshold fraction.

Scale shape (100 TB corpus): the eval side is a benchmark suite —
thousands of documents, millions of distinct n-grams at most — so the
distinct eval-gram set is **broadcast** and the whole check runs
map-side over the corpus scan: explode → broadcast-hash left join →
per-doc partial count.  The only shuffle is the final groupBy on
doc_id, which moves two longs per (task, doc) after map-side partial
aggregation.  If the eval set ever outgrew broadcast range, dropping
the `broadcast()` hint falls back to a shuffled hash join on the gram
key with no semantic change.

Reference has no decontamination surface (SURVEY.md §2); this is part
of the BASELINE.json north-star LLM-data operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafik_etl_modular_spark.llmdata.dedup import shingles


def eval_ngrams(eval_docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct word k-grams of the eval/benchmark set: one column
    ``g``.  Small by construction (benchmark suites, not corpora)."""
    return eval_docs.select(F.explode(shingles(text_col, k)).alias("g")).distinct()


def contamination_stats(
    train_docs: DataFrame,
    eval_gram_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-train-document contamination against ``eval_gram_set``.

    Returns (id, n_ngrams, n_hits, contamination, contaminated).
    Documents with fewer than k tokens have zero n-grams and
    contamination 0.0 — they are kept, not dropped, so the output is
    a total function of the training corpus (the curation filter
    downstream decides what to do with flagged rows).
    """
    grams = train_docs.select(id_col, F.explode(shingles(text_col, k)).alias("g"))
    hits = (
        grams.join(
            F.broadcast(eval_gram_set.withColumn("_hit", F.lit(1))), "g", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("_hit").alias("n_hits"),  # count() skips NULL = misses
        )
    )
    contamination = F.when(
        F.col("n_ngrams") > 0,
        F.col("n_hits").cast("double") / F.col("n_ngrams"),
    ).otherwise(F.lit(0.0))
    return (
        train_docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("int").alias("n_ngrams"),
            F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
        )
        .withColumn("contamination", contamination)
        .withColumn("contaminated", contamination >= F.lit(threshold))
    )
