"""Text-analysis operators over a document corpus: tokenization,
quality scoring, language-ID heuristics, fingerprinting.

All pure Catalyst expressions (split / filter / aggregate / transform
higher-order functions) — zero Python in the row path, so they run at
scan speed and whole-stage-codegen fuses them with the parquet read.
Each has an exact ANSI-SQL mirror for the DuckDB oracle (see
queries/llmdata.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword marker sets for the language-ID heuristic. Tiny on purpose:
# they are broadcast as expression literals, not a join.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the corpus is space-separated; a
    BPE-ish regex split is `F.split(c, r"\\W+")` — same shape)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def _in_list_filter(arr: Column, words: tuple[str, ...]) -> Column:
    """size(filter(arr, x -> x IN (...))) — counts WITH duplicates
    (array_intersect would dedup and skew the ratios)."""
    return F.size(F.filter(arr, lambda x: x.isin(*words)))


def stopword_count(text: Column | str, words: tuple[str, ...] = STOPWORDS) -> Column:
    return _in_list_filter(tokens(text), words)


def quality_score(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: rewards mid-length documents and a
    sane stopword ratio, penalizes very short docs. Deterministic
    double arithmetic (mirrored in SQL):

        len_score  = least(n_tokens, 200) / 200.0
        stop_ratio = stopword_count / n_tokens
        score      = 0.7 * len_score + 0.3 * least(stop_ratio * 5, 1.0)
    """
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok, F.lit(200.0)) / F.lit(200.0)
    stop_ratio = stopword_count(c).cast("double") / n_tok
    return F.lit(0.7) * len_score + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit counts per candidate language."""
    arr = tokens(text)
    return {lang: _in_list_filter(arr, words) for lang, words in LANG_MARKERS.items()}


def predict_lang(text: Column | str) -> Column:
    """Arg-max language by marker hits, ties broken by language-code
    order (en < de < fr < es priority as written), 'und' when no
    marker hits at all."""
    scores = lang_scores(text)
    # When-chain: the first language reaching the max hit count wins.
    greatest = F.greatest(*scores.values())
    chain = None
    for lang in ("en", "de", "fr", "es"):
        cond = (scores[lang] == greatest) & (greatest > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(F.lit("und"))


# BPE-style pre-tokenization: letter runs | digit runs | single
# punctuation mark — the split GPT-style BPE applies before merges.
# Kept to a regex subset with identical semantics in Java regex
# (Spark) and RE2-ish (DuckDB).
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column | str) -> Column:
    """Regex pre-tokenization (letters/digits/punct classes) — the
    'BPE-ish' counter: real BPE merges only ever split these further,
    so this counts an upper-bound token budget at scan speed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0)


def punct_count(text: Column | str) -> Column:
    """Punctuation marks (non-alnum, non-space chars)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), 0))


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters): natural text has
# a characteristic repetition profile; boilerplate, spam, and
# templated pages repeat tokens and n-grams far more. Both signals
# are pure per-row higher-order functions — zero shuffle, zero
# Python, linear in document size — so at 100 TB they run at scan
# speed and the filter they feed is an ordinary pushed predicate.
# ---------------------------------------------------------------------------


def distinct_token_fraction(text: Column | str) -> Column:
    """|distinct tokens| / |tokens| — low values flag repetitive docs."""
    arr = tokens(text)
    return F.size(F.array_distinct(arr)).cast("double") / F.size(arr)


def bigrams(text: Column | str) -> Column:
    """Adjacent token pairs joined with a single space, as
    zip_with(slice(toks, 1, n-1), slice(toks, 2, n-1), concat) —
    each slice evaluates the token split ONCE PER ROW and zip_with
    walks the two materialized arrays.  The index-transform
    formulation (element_at(split(text), i) inside the lambda) looks
    equivalent but re-splits the document once per pair index after
    CollapseProject inlines it — O(n²) per row, measured 5× slower
    on the corpus queries (same trap as top_bigram_count's nested-HOF
    note below).  Guarded for <2-token docs: slice with a
    non-positive length errors, so the branch must be explicit."""
    arr = tokens(text)
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(arr, 1, n - 1),
            F.slice(arr, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_bigram_count(text: Column | str) -> Column:
    """Occurrences of the most frequent bigram, as the longest equal
    run in the SORTED bigram array — one array_sort + one aggregate
    fold, O(n log n) per row with the bigram array evaluated exactly
    once.  (The naive nested-HOF form — filter(bi, ·) inside
    transform(array_distinct(bi), ·) — re-evaluates the whole bigram
    expression once per DISTINCT bigram after CollapseProject inlines
    it: measured 15× slower on the fixture, and quadratic in document
    size.)  Empty/one-token docs → 0."""
    state = "struct<prev:string,run:int,best:int>"
    fold = F.aggregate(
        F.array_sort(bigrams(text)),
        F.lit(None).cast(state),
        lambda acc, x: F.when(
            x == acc["prev"],
            F.struct(
                x.alias("prev"),
                (acc["run"] + 1).alias("run"),
                F.greatest(acc["best"], acc["run"] + 1).alias("best"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).alias("run"),
                F.greatest(F.coalesce(acc["best"], F.lit(0)), F.lit(1)).alias("best"),
            )
        ),
        lambda acc: acc["best"],
    )
    return F.coalesce(fold, F.lit(0))


# ---------------------------------------------------------------------------
# PII redaction: scrub emails, IPv4 addresses, and long digit runs
# (account/phone-shaped ids) before a corpus ships to training.
# Regexes restricted to a subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB oracle). Replacement order matters
# and is fixed: emails first (they contain digit runs), then IPv4
# (dotted digits would otherwise be eaten as digit runs), then bare
# digit runs.
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
IDNUM_RE = r"\d{6,}"


def _count_re(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Match counts per PII class (on the ORIGINAL text)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": _count_re(c, EMAIL_RE),
        "n_ipv4": _count_re(c, IPV4_RE),
        "n_idnum": _count_re(c, IDNUM_RE),
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with a typed placeholder token.
    Spark's regexp_replace is global; the DuckDB mirror needs the 'g'
    flag to match."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, IDNUM_RE, "<ID>")


def char_fingerprint(text: Column | str, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters (document fingerprint):
    fold (acc*31 + ascii(char)) % mod left-to-right — order-sensitive,
    deterministic, and expressible identically in ANSI SQL via
    list_reduce. Pure JVM (aggregate higher-order function)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * 31 + F.ascii(c.substr(i, F.lit(1)))) % mod,
    )


def bigram_lm_scores(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Self-trained bigram-LM scores for a documents frame: per doc,
    (n_pairs, sum_q_e9, mean_bigram_prob_e9) where each adjacent-pair
    ratio c(prev cur)/c_prefix(prev) is scaled by 1e9 and computed
    with PURE INTEGER DIVISION, then summed as bigints (order-free
    aggregation; every driver-visible cell is a bigint — no double
    appears anywhere in the expression, on either engine; see
    queries.llmdata.text_bigram_lm_score for the plan and oracle
    discussion).  Docs with <2 tokens have no pairs and drop out."""
    from pyspark.sql import DataFrame  # noqa: F401  (doc typing only)

    pairs = docs.select(id_col, F.explode(bigrams(text_col)).alias("pair"))
    pc = pairs.groupBy("pair").agg(F.count("*").alias("c_bi"))
    pfx = (
        pairs.select(F.split("pair", " ").getItem(0).alias("prev"))
        .groupBy("prev")
        .agg(F.count("*").alias("c_prev"))
    )
    q = F.expr("(c_bi * 1000000000) DIV c_prev")
    return (
        pairs.join(pc, "pair")
        .join(pfx, F.split(F.col("pair"), " ").getItem(0) == F.col("prev"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_pairs"), F.sum(q).alias("sum_q_e9"))
        .select(
            id_col,
            "n_pairs",
            "sum_q_e9",
            F.expr("sum_q_e9 DIV n_pairs").alias("mean_bigram_prob_e9"),
        )
    )
