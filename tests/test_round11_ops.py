"""Round-11 batch: the LPA radix guard, the bigram single-token-doc
guard (ADVICE r10), and model-pinned checks for the round's new
operators."""

from __future__ import annotations

import pytest

from trafik_etl_modular_spark.registry import REGISTRY, _load_all

SF = "/root/testdata/sf0.001"


def _q(name):
    _load_all()
    return REGISTRY[name].fn


def test_lpa_radix_guard_raises_on_oversized_id(spark):
    """A vertex id at/above _LPA_M must raise loudly instead of
    silently colliding packed (count,label) argmax keys."""
    from trafik_etl_modular_spark.queries.graph import _LPA_M, _check_lpa_radix

    bad = spark.createDataFrame([(1, _LPA_M)], "u long, v long")
    with pytest.raises(ValueError, match="packing radix"):
        _check_lpa_radix(bad)
    # ids strictly below the radix pass
    ok = spark.createDataFrame([(1, _LPA_M - 1)], "u long, v long")
    _check_lpa_radix(ok)


def test_bigram_collocations_survive_single_token_docs(spark, tmp_path):
    """ADVICE r10: sequence(1, 0) defaults to step -1 in Spark and
    produced [1, 0] → element_at(w, 0) threw on any 1-token document.
    The guarded explode must yield no bigrams for such docs (matching
    DuckDB's empty range) and still count the multi-token ones."""
    import duckdb

    docs = [
        (1, "solo"),
        (2, ""),
        (3, "alpha beta alpha beta alpha beta alpha beta alpha beta"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    rows = _q("text_bigram_collocations")(spark, d).collect()
    got = {r["bigram"]: r["n"] for r in rows}
    # only "alpha beta" reaches the min count of 5; the 1-token and
    # empty docs contribute nothing (and crash nothing)
    assert got == {"alpha beta": 5}
    # and the DuckDB oracle agrees on the same hostile fixture
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    q = REGISTRY["text_bigram_collocations"]
    drows = con.execute(q.render_sql(d)).fetchall()
    assert {(r[0], r[1]) for r in drows} == {("alpha beta", 5)}
