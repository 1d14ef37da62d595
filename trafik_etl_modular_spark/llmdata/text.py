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
