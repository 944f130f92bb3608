"""LLM-data-pipeline operators (north-star extensions beyond the reference's
surface): deduplication, similarity search, text analysis, multimodal column
plumbing.  Importing registers their queries."""

from auron_spark.pipeline import (  # noqa: F401
    bpe,
    dedup,
    evaluation,
    experiments,
    features,
    geo,
    multimodal,
    recommend,
    regression,
    retrieval,
    sampling,
    similarity,
    simjoin,
    text,
)
