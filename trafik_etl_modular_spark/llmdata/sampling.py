"""Deterministic sampling and batch packing for training-data
pipelines.

Reproducibility is the design constraint: every sampling decision is a
pure function of the ROW'S OWN KEY, never of `rand()`.  Spark's
`rand(seed)` / `df.sample` / `sampleBy` draw per-(partition, row-index)
streams, so results change whenever partitioning or row order changes —
unacceptable for train/val/test splits that must stay stable across
re-runs, cluster sizes, and compactions.  A content-keyed hash bucket
gives the same assignment on 1 executor or 1000 (and lets an oracle SQL
engine reproduce it exactly).

The hash is Knuth multiplicative hashing modulo a large prime —
expressible identically in any SQL dialect.  Exact for keys below
~3.4e9 (product stays under 2^63; the fixture ids and any
per-partition sequence fit).  For string keys or a full 64-bit domain,
swap in xxhash64 and drop the cross-engine oracle (rows-only check),
as the sketching operators do.

The reference has no sampling surface (SURVEY.md §2); this family is
part of the BASELINE.json north star (LLM-data pipeline operators).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MOD = 1_000_000_007
MULT = 2_654_435_761  # Knuth's 2^32 / golden-ratio constant
OFFSET = 12_345

# Per-operator salts: each sampling family must draw from a DIFFERENT
# hash stream.  With a shared unsalted bucket, survival under one
# operator is perfectly correlated with assignment under another —
# e.g. every weighted_sample survivor with quality < 0.9 was
# necessarily a 'train' doc under the default 900/50/50 split, so
# composing the two emptied val/test.  Salting the key before the
# multiplicative hash decorrelates the families while staying pure
# integer arithmetic (SQL-expressible, engine-stable).
SALT_SPLIT = 0  # assign_split — the base stream
SALT_STRATIFIED = 104_729  # stratified_sample (10000th prime)
SALT_WEIGHTED = 7_919  # weighted_sample (1000th prime)


def hash_bucket(key: Column | str, n_buckets: int = 1000, salt: int = 0) -> Column:
    """Deterministic bucket in [0, n_buckets) from a non-negative
    integer key: (((key + salt) * MULT + OFFSET) % MOD) % n_buckets.

    Pure arithmetic → identical in Spark and ANSI SQL; stable under
    repartitioning, re-runs, and engine versions (unlike rand(seed)).
    ``salt`` decorrelates independent sampling decisions over the same
    key (see the per-operator SALT_* constants)."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        ((c.cast("long") + F.lit(salt)) * F.lit(MULT) + F.lit(OFFSET)) % F.lit(MOD)
    ) % F.lit(n_buckets)


def hash_bucket_sql(key_expr: str, n_buckets: int = 1000, salt: int = 0) -> str:
    """The same bucket computation as ANSI SQL text (for oracles)."""
    return f"(((({key_expr}) + {salt}) * {MULT} + {OFFSET}) % {MOD}) % {n_buckets}"


def assign_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: Iterable[tuple[str, int]] = (("train", 900), ("val", 50), ("test", 50)),
) -> DataFrame:
    """Add a `split` column from per-mille weights (must sum to 1000).

    Buckets are half-open cumulative ranges: with 900/50/50,
    bucket < 900 → train, < 950 → val, else test.  Integer per-mille
    weights avoid float-threshold drift between engines."""
    ws = list(weights)
    total = sum(w for _, w in ws)
    if total != 1000:
        raise ValueError(f"per-mille weights must sum to 1000, got {total}")
    b = hash_bucket(key_col, 1000)
    expr = F.lit(ws[-1][0])
    cum = 0
    conds = []
    for name, w in ws[:-1]:
        cum += w
        conds.append((cum, name))
    for cum, name in reversed(conds):
        expr = F.when(b < cum, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def exact_quota_split(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "doc_id",
    num: int = 8,
    den: int = 10,
) -> DataFrame:
    """EXACT-quota stratified split: within each group, the first
    ``(n·num) div den`` rows in salted-md5 order are 'train', the
    rest 'holdout' — per-group proportions hit exactly (integer
    arithmetic, no rounding drift), unlike the hash-bucket split
    whose per-group fractions only converge in expectation.

    Costs one shuffle (the per-group window); the hash-bucket split
    stays a pure scan predicate — that's the trade: exact quotas
    need the group count, expected-fraction splits don't.  The md5
    order key is salted with the operator name so quota assignment is
    decorrelated from every other sampling family."""
    sk = F.md5(F.concat(F.lit("quota|"), F.col(key_col).cast("string")))
    w_rank = Window.partitionBy(group_col).orderBy(sk, key_col)
    w_cnt = Window.partitionBy(group_col)
    rn = F.row_number().over(w_rank).cast("long")
    n = F.count("*").over(w_cnt)
    # rn ≤ floor(n·num/den)  ⟺  rn·den ≤ n·num — pure integer
    # comparison, no division, no floating point anywhere.
    return df.withColumn(
        "split",
        F.when(rn * F.lit(den) <= n * F.lit(num), F.lit("train")).otherwise(
            F.lit("holdout")
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_permille: dict[str, int],
    key_col: str = "doc_id",
    default_permille: int = 0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    per-mille rate — deterministic `sampleBy`.

    The filter is a when-chain over the (small) strata domain, pushed
    into the scan like any other predicate; no shuffle, no RNG state.
    Exactly reproducible: re-running over recompacted files keeps the
    SAME rows, which row-index-seeded Bernoulli sampling does not.
    Salted with SALT_STRATIFIED so keep/drop here is independent of
    :func:`assign_split`'s train/val/test assignment."""
    b = hash_bucket(key_col, 1000, salt=SALT_STRATIFIED)
    rate = F.lit(default_permille)
    for stratum, r in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(b < rate)


def weighted_sample(
    df: DataFrame, weight_col: Column | str, key_col: str = "doc_id"
) -> DataFrame:
    """Keep each row with probability ≈ its own weight in [0, 1] —
    importance sampling (keep-prob ∝ quality/score), deterministically:
    the row survives iff hash_bucket(key) < floor(weight·1000).

    Same reproducibility contract as the rest of the family: a pure
    function of the row's key and weight, stable under repartitioning
    and re-runs, pushed into the scan as an ordinary predicate — no
    RNG state, no shuffle.  Weight resolution is per-mille (matching
    hash_bucket's 1000 buckets).  Salted with SALT_WEIGHTED so
    survival here is independent of :func:`assign_split` /
    :func:`stratified_sample` decisions over the same key."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(hash_bucket(key_col, 1000, salt=SALT_WEIGHTED) < F.floor(w * 1000))


def pack_bins(
    df: DataFrame,
    token_col: str,
    capacity: int,
    key_col: str = "doc_id",
    n_packers: int = 32,
) -> DataFrame:
    """Assign every document a (pack_bucket, bin_idx) training-batch
    bin of ~`capacity` tokens: documents are ordered by key within a
    deterministic pack bucket and cut at running-token-count
    boundaries (bin_idx = floor(tokens_before / capacity)).

    This is sequence packing for LLM training shards, shaped for
    scale: the running sum is a window PARTITIONED by pack_bucket, so
    there are n_packers independent window partitions instead of one
    global sort — each packer's state fits one task, and packers scale
    with the cluster (a single global ORDER BY window would serialize
    100 TB through one task).  Documents may straddle a boundary;
    concat-and-chunk training with document masking handles that by
    construction."""
    bucket = hash_bucket(key_col, n_packers).alias("pack_bucket")
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select("*", bucket).withColumn(
        "tokens_before",
        F.sum(F.col(token_col)).over(w) - F.col(token_col),
    )
    return out.withColumn(
        "bin_idx",
        F.floor(F.col("tokens_before") / F.lit(float(capacity))).cast("long"),
    ).drop("tokens_before")


def shuffle_key(key: Column | str) -> Column:
    """Content-keyed global shuffle key: md5 hex of the row key.

    Training-data ordering must be pseudo-random but REPRODUCIBLE —
    the same corpus must shuffle identically on 1 executor or 1000,
    across re-runs and compactions, which rules out rand(seed) (a
    per-(partition, row-index) stream).  md5 of the key is a pure
    row function, uniform over the hex space, and identical in every
    SQL engine.

    Scale shape: the writer does ``repartitionByRange(N, shuffle_key)
    .sortWithinPartitions(shuffle_key)`` — globally shuffled order
    across sorted output files WITHOUT a single-task global
    row_number; readers stream files in name order and see a
    deterministic permutation."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(c.cast("string"))


def token_budget_mix(
    df: DataFrame,
    group_col: str = "source",
    token_col: str = "n_tok",
    budget: int = 3000,
    key_col: str = "doc_id",
) -> DataFrame:
    """Data mixing under a per-group token budget: within each group
    (source / language / domain), admit documents in deterministic
    shuffled order until the group's token budget is spent.

    Order inside a group is :func:`shuffle_key` (md5-of-key) — an
    unbiased, reproducible sample of the group, not "whatever the
    scan returned first".  A document is admitted while the running
    total BEFORE it is under budget, so each group overshoots by at
    most one document (concat-and-chunk training absorbs the tail).

    One shuffle: the per-group cumulative-sum window.  Groups
    parallelize across the cluster; a single giant group serializes
    through one task — for that shape, split the group into
    :func:`pack_bins`-style hash sub-buckets with budget/n per bucket
    (same admission semantics, n-way parallel).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(shuffle_key(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "tokens_before", F.sum(F.col(token_col)).over(w) - F.col(token_col)
        )
        .filter(F.col("tokens_before") < F.lit(budget))
        .drop("tokens_before")
    )


def temperature_mix_rates(
    df: DataFrame,
    group_col: str = "source",
    token_col: str = "n_tok",
    alpha_num: int = 1,
    alpha_den: int = 2,
    target_frac_ppm: int = 500_000,
) -> DataFrame:
    """Per-source TEMPERATURE-MIXED sampling rates — the standard
    multi-domain training-mix formula (GPT-3 / The Pile / mC4's
    alpha-smoothed mixing, cf. Raffel et al. 2020 §3.4.3): sampling
    weight p_s ∝ (tokens_s)^alpha with alpha < 1 UPWEIGHTS small
    domains relative to their natural share; each source's admission
    rate is min(1, T·p_s / tokens_s) for a global token target T.

    Exactness across engines (nothing here is approximate):
      * alpha must be DYADIC (alpha_den a power of two): x^(n/2^k)
        is computed as k nested ``sqrt`` calls followed by an integer
        power (repeated multiply).  sqrt and multiply are IEEE
        correctly-rounded in every engine, so the fixed composition
        yields bit-identical doubles everywhere — which a library
        ``pow()`` does not guarantee.  alpha = 1/2 is one sqrt;
        alpha ≈ 0.7 is 11/16 (four sqrts, then ^11);
      * the weight is FIXED-POINT: s_s = floor(sqrt(tokens_s)·2^20)
        as BIGINT, so the normalizer Z = Σ s_s is an integer sum —
        associative, partition-order-free;
      * the admission rate is quantized to a 32-bit integer
        threshold thr_s = floor(min(1, T·s_s/(Z·tokens_s))·2^32)
        computed with one fixed double-expression order, and the
        reported rate is thr_s/2^32 — a float derived from an
        integer, immune to repr/ULP divergence (cf. scalars.fquant).

    Returns one row per source: (source, n_docs, n_tokens, s_fix,
    thr) — join :func:`temperature_mix_admit` against it, or read
    thr/2^32 as the rate."""
    if alpha_den <= 0 or alpha_den & (alpha_den - 1) != 0:
        raise NotImplementedError(
            "alpha_den must be a power of two — x^(n/2^k) is computed as "
            "nested sqrt + integer power, the cross-engine-exact formulation"
        )
    if not 0 < alpha_num <= alpha_den:
        raise ValueError("alpha must be in (0, 1]")
    per = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_col)).alias("n_tokens"),
    )
    # x^(1/2^k): k nested sqrts; then ^alpha_num by repeated multiply
    root = F.col("n_tokens").cast("double")
    k = alpha_den.bit_length() - 1
    for _ in range(k):
        root = F.sqrt(root)
    powed = F.lit(1.0)
    for _ in range(alpha_num):
        powed = powed * root
    per = per.withColumn(
        "s_fix", F.floor(powed * F.lit(float(1 << 20))).cast("long")
    )
    totals = per.agg(
        F.sum("s_fix").alias("z_fix"), F.sum("n_tokens").alias("tot_tokens")
    )
    # integer global token target: floor(total · target_ppm / 1e6) —
    # explicit floor, because a bare cast-to-bigint TRUNCATES in
    # Spark but ROUNDS in DuckDB on the same x.5 double
    rate = F.least(
        F.lit(1.0),
        (
            F.floor(
                F.col("tot_tokens").cast("double")
                * F.lit(float(target_frac_ppm))
                / F.lit(1e6)
            ).cast("double")
            * F.col("s_fix").cast("double")
        )
        / (F.col("z_fix").cast("double") * F.col("n_tokens").cast("double")),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .withColumn("thr", F.floor(rate * F.lit(float(1 << 32))).cast("long"))
        .select(group_col, "n_docs", "n_tokens", "s_fix", "thr")
    )


def temperature_mix_admit(
    df: DataFrame,
    rates: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Admit rows at their source's temperature-mix rate: the row's
    32-bit md5-derived uniform must fall below the source's integer
    threshold — a pure integer compare, reproducible on any engine
    and any partitioning (the rates side is a tiny broadcast)."""
    u32 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        df.join(F.broadcast(rates.select(group_col, "thr")), group_col)
        .filter(u32 < F.col("thr"))
        .drop("thr")
    )
