"""Custom connector via Spark 4's pure-Python DataSource API.

The reference ships native connectors (Kafka `flink/kafka_scan_exec.rs`,
lakehouse `thirdparty/auron-iceberg/...`); the idiomatic PySpark-native
extension point for a NEW source is `pyspark.sql.datasource` — a DataSource
implemented in Python, registered on the session, readable through the
ordinary `spark.read.format(...)` path with real partition-parallel reads.

`synthdocs` below is a deterministic synthetic-corpus source: every row is a
pure function of (doc_id) via md5, so a DuckDB oracle can reproduce the
entire table and the driver's hash check applies to a *custom connector's*
output — connector plumbing proven end-to-end, not just smoke-tested.

Scale posture: partition planning (`partitions()`) is driver-side and cheap;
each `read(partition)` runs in an executor Python worker, emitting Arrow
batches back to the JVM.  A Python source is an INTEGRATION path (APIs,
bespoke formats, test rigs) — columnar formats at 100 TB stay on native
scans; that trade-off is the same one the reference makes with JNI readers.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from auron_spark.registry import query

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
    "rho", "sigma", "tau", "upsilon",
]
N_DOCS = 200
N_PARTS = 4


def _h32(s: str) -> int:
    """32-bit integer from an md5 prefix — mirrored in SQL as
    CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _doc_text(i: int) -> str:
    n_words = 5 + _h32(f"{i}:len") % 16
    return " ".join(VOCAB[_h32(f"{i}:{j}") % len(VOCAB)] for j in range(n_words))


class SynthDocsDataSource(DataSource):
    """`spark.read.format("synthdocs")` — options: n_docs, partitions.

    Also a STREAMING source (`spark.readStream.format("synthdocs")`, option
    batch_size): micro-batches advance a {pos} offset through the same
    deterministic corpus, with `readBetweenOffsets` replay for recovery —
    the offset/startup semantics of the reference's Kafka scan
    (`flink/kafka_scan_exec.rs:81`), demonstrated live in pure Python while
    the Kafka connector itself stays environment-gated."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, source string, text string, n_chars bigint"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthDocsStreamReader":
        return SynthDocsStreamReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", N_DOCS))
        self.n_parts = int(options.get("partitions", N_PARTS))

    def partitions(self):
        # contiguous doc_id ranges -> each executor task generates its slice
        step = (self.n_docs + self.n_parts - 1) // self.n_parts
        return [
            InputPartition((lo, min(lo + step, self.n_docs)))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            text = _doc_text(i)
            yield (i, f"src{i % 4}", text, len(text))


def _rows(lo: int, hi: int) -> list[tuple]:
    # a LIST (not a generator): the simple-stream prefetch cache pickles the
    # returned iterator for replay, and generators cannot be pickled
    out = []
    for i in range(lo, hi):
        text = _doc_text(i)
        out.append((i, f"src{i % 4}", text, len(text)))
    return out


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the bounded synthetic corpus: offset = {pos};
    each batch emits the next batch_size docs until n_docs is reached, after
    which batches are empty (offset stops advancing).  readBetweenOffsets
    re-derives any committed range exactly — replay-safe because rows are a
    pure function of doc_id."""

    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", N_DOCS))
        self.batch = int(options.get("batch_size", 50))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch, self.n_docs)
        return iter(_rows(lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_rows(start["pos"], end["pos"]))


def register(spark: SparkSession) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(SynthDocsDataSource)


_SQL_W = (
    "VOCAB[1 + CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' "
    "|| CAST(j AS VARCHAR)), 1, 8) AS BIGINT) % 20]"
)


@query(
    "pyds_synthdocs_scan",
    oracle=f"""
    WITH v AS (
        SELECT {VOCAB!r} AS VOCAB
    ),
    docs AS (
        SELECT i AS doc_id,
               'src' || CAST(i % 4 AS VARCHAR) AS source,
               array_to_string(
                   list_transform(
                       range(0, 5 + CAST('0x' || substr(md5(CAST(i AS VARCHAR)
                                || ':len'), 1, 8) AS BIGINT) % 16),
                       j -> {_SQL_W}), ' ') AS text
        FROM range(0, {N_DOCS}) t(i), v
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           md5(string_agg(text, '|' ORDER BY doc_id)) AS corpus_md5
    FROM docs
    GROUP BY source
    ORDER BY source
    """,
    tags=("source", "python-datasource"),
)
def pyds_synthdocs_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource and summarize per source —
    the corpus_md5 digest makes the oracle sensitive to every generated byte,
    so this green row proves the connector's partition-parallel read path
    end-to-end (sf_dir is unused: the source is synthetic by construction).
    """
    register(spark)
    docs = spark.read.format("synthdocs").load()
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                        lambda s: s["text"],
                    ),
                    "|",
                )
            ).alias("corpus_md5"),
        )
        .orderBy("source")
    )
