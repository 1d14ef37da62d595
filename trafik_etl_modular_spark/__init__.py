"""trafik_etl_modular_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline (siffror/trafik-ETL-modular,
surveyed in SURVEY.md) as idiomatic Spark SQL / DataFrame /
Structured Streaming code, extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Design stance (SURVEY.md §7.1):
  * DataFrame/SQL first — declare logical plans, let Catalyst pick
    physical strategies (broadcast vs SMJ, partial aggs, pushdown).
  * Deterministic semantics — `now` is an injected literal, dedups
    use explicit window orderings, money aggregates use exact
    decimal sums so results are reproducible across engines.
  * Scale-first — broadcast small dims, pre-aggregate before joins
    where cardinality allows, keep expressions JVM-side; Python
    (pandas UDF) only where built-ins can't express the op.
"""

__version__ = "0.1.0"

from trafik_etl_modular_spark.session import get_spark  # noqa: F401
from trafik_etl_modular_spark.catalog import load_table, load_tables  # noqa: F401
