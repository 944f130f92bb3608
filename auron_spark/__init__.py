"""auron-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of apache/auron (SURVEY.md), plus LLM-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

The host engine is Spark itself: queries are declared through DataFrame/SQL,
Catalyst plans them, and this package contributes the operator surface, tuned
session bootstrap, scale-aware strategies and the differential-testing
contract (`auron_spark.registry`).
"""

from auron_spark.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    bench_queries,
    load_all,
    oracle_sql,
    queries,
    query,
)
from auron_spark.session import ENGINE_CONF, get_spark, tune_session  # noqa: F401
from auron_spark.tables import TABLE_NAMES, Tables, register_views  # noqa: F401

__version__ = "0.1.0"
