"""URL canonicalization + host policy (queries/web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.web import (
    _canonical_url_steps,
    dedup_url_canonical,
    text_host_quality_policy,
)

CASES = [
    # (raw, expected canonical)
    ("https://a.example.org/docs/1#frag", "https://a.example.org/docs/1"),
    ("https://a.example.org/docs/1?utm_source=x&utm_campaign=y", "https://a.example.org/docs/1"),
    # dangling '&' repair: utm was first, real param must get the '?'
    ("https://a.example.org/p?utm_a=1&page=2", "https://a.example.org/p?page=2"),
    # real param first, tracking after
    ("https://a.example.org/p?page=2&utm_medium=rss", "https://a.example.org/p?page=2"),
    # scheme+host lowered, PATH case preserved
    ("HTTPS://A.Example.ORG/Docs/Q", "https://a.example.org/Docs/Q"),
    # default https port stripped
    ("https://a.example.org:443/docs/1", "https://a.example.org/docs/1"),
    # non-default port survives
    ("https://a.example.org:8443/docs/1", "https://a.example.org:8443/docs/1"),
    # default ports are scheme-specific
    ("http://a.example.org:80/docs/1", "http://a.example.org/docs/1"),
    ("http://a.example.org:443/docs/1", "http://a.example.org:443/docs/1"),
    ("https://a.example.org:80/docs/1", "https://a.example.org:80/docs/1"),
    # trailing slash stripped on non-root
    ("https://a.example.org/docs/1/", "https://a.example.org/docs/1"),
    # root slash preserved
    ("https://a.example.org/", "https://a.example.org/"),
    # everything at once
    (
        "HTTPS://A.EXAMPLE.ORG:443/docs/9/?utm_source=f&utm_campaign=x#z",
        "https://a.example.org/docs/9",
    ),
]


def test_canonicalization_planted_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [
        r["c"]
        for r in df.select(_canonical_url_steps(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_url_dedup_group_structure(spark, sf_dir):
    """Each 5-doc group yields one 4-variant canonical key (v0/v1/v3/v4)
    and one singleton carrying the surviving real param (v2)."""
    rows = dedup_url_canonical(spark, sf_dir).collect()
    by_size = {}
    for r in rows:
        by_size.setdefault(r["n_variants"], []).append(r)
    assert set(by_size) == {4, 1}
    assert len(by_size[4]) == len(by_size[1])
    for r in by_size[1]:
        assert r["canonical_url"].endswith("?page=2")
    for r in by_size[4]:
        # keeper is the v0 member (smallest doc_id in the group)
        assert r["kept_doc_id"] % 5 == 0
        # four spellings collapsed into one canonical key
        assert r["n_distinct_spellings"] == 4


def test_host_policy_thresholds(spark, sf_dir):
    rows = text_host_quality_policy(spark, sf_dir).collect()
    assert rows, "host rollup must not be empty"
    for r in rows:
        want = (
            "keep"
            if r["mean_quality"] >= 0.6
            else "review" if r["mean_quality"] >= 0.4 else "drop"
        )
        assert r["policy"] == want
        assert r["n_low_quality"] <= r["n_docs"]


def test_canonicalization_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the fixed-point
    property a dedup key MUST have (or re-canonicalizing a stored key
    would change it).  Checked over the planted cases, the derived
    fixture URLs, and a battery of adversarial shapes."""
    adversarial = [
        "https://a.example.org/p?utm_a=1&utm_b=2&page=2&utm_c=3",
        "https://a.example.org/p?page=2",
        "https://a.example.org:443/",
        "HTTP://A.ORG:443/X",          # :443 NOT default for http — must survive
        "https://a.org/p?utm_x=&y=1",
        "https://a.org/p#",
        "https://a.org/p?utm_only=v#f",
        "ftp://Mixed.Case.Host/Path/",
    ]
    base = [r for r, _ in CASES] + adversarial
    df = spark.createDataFrame([(u,) for u in base], ["url"])
    once = [
        r["c"] for r in df.select(_canonical_url_steps(F.col("url")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(u,) for u in once], ["url"])
    twice = [
        r["c"] for r in df2.select(_canonical_url_steps(F.col("url")).alias("c")).collect()
    ]
    assert twice == once
