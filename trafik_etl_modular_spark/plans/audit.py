"""Plan-audit utilities: inspect what Catalyst actually planned.

The reference has no plan IR at all (SURVEY.md §4 — eager pandas);
this engine's "optimizer work" is (a) expressing queries so Catalyst
can optimize them and (b) VERIFYING it did.  These helpers are the
verification surface, used by `tests/test_plans.py` and available
interactively:

    from trafik_etl_modular_spark.plans.audit import explain, audit
    print(explain(df))              # formatted plan
    print(audit(df))                # one-line scorecard
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain(df: DataFrame, mode: str = "formatted") -> str:
    """The explain string for any mode ('simple', 'extended',
    'formatted', 'codegen', 'cost') without printing to stdout."""
    qe = df._jdf.queryExecution()
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return qe.explainString(jmode)


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved) physical plan — requires the query to have
    run; codegen stages appear as `*(n)` markers."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanAudit:
    n_exchanges: int
    n_broadcast_joins: int
    n_sort_merge_joins: int
    has_cartesian: bool
    has_python_eval: bool
    pushed_filters: bool
    take_ordered: bool

    def __str__(self) -> str:  # one-line scorecard
        return (
            f"exchanges={self.n_exchanges} bhj={self.n_broadcast_joins} "
            f"smj={self.n_sort_merge_joins} cartesian={self.has_cartesian} "
            f"python_eval={self.has_python_eval} pushdown={self.pushed_filters} "
            f"take_ordered={self.take_ordered}"
        )


def audit(df: DataFrame) -> PlanAudit:
    """Scorecard over the pre-execution plan: shuffle count, join
    strategies, Python-eval presence, pushdown, sorted-limit."""
    plan = explain(df, "formatted")
    simple = explain(df, "simple")
    return PlanAudit(
        # SHUFFLE exchanges only — BroadcastExchange moves a dim to
        # every executor, which is the cheap path we're not counting.
        n_exchanges=simple.count("Exchange") - simple.count("BroadcastExchange"),
        n_broadcast_joins=simple.count("BroadcastHashJoin"),
        n_sort_merge_joins=simple.count("SortMergeJoin"),
        has_cartesian="CartesianProduct" in simple
        or "BroadcastNestedLoopJoin" in simple,
        has_python_eval="BatchEvalPython" in simple or "ArrowEvalPython" in simple,
        pushed_filters=bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        take_ordered="TakeOrderedAndProject" in simple,
    )
