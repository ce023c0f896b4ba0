"""Streaming corpus ingestion with exact dedup — the streaming form of
the dedup pipeline's end stage (keep first arrival per content
fingerprint), designed for 100 TB state:

- the dedup state is a NARROW side table of md5 fingerprints (16 bytes
  per document), committed in the same cadence as the corpus appends —
  each micro-batch anti-joins against fingerprints, never against the
  corpus text, so per-batch state IO is ~1/1000th of rescanning text;
- within-batch duplicates resolve to the min id (same canonical rule as
  ``functions.dedup.exact_dup_groups``);
- the anti-join is a plain equi-join on the 128-bit digest: AQE
  broadcasts the (small) batch side against the (large) state side at
  scale — the batch never sees more than one shuffle;
- idempotent: re-delivered documents hit an existing fingerprint and are
  dropped, so at-least-once delivery upstream composes into
  effectively-once corpus state (the HyTable commit itself is atomic).

≙ the reference's write-side dedup discipline composed with its
streaming sync worker (SURVEY §3.2); the same pattern extends to any
content key (simhash buckets, URL canonicalization) by swapping the
fingerprint expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..lake.table import HyTable

FINGERPRINT_DDL = "fp string"


def fingerprint(text_col: str = "text"):
    """Content fingerprint used for dedup state: md5 over raw bytes."""
    return F.md5(F.col(text_col).cast("binary"))


def dedup_ingest_batch(
    batch_df: DataFrame,
    corpus: HyTable,
    fingerprints: HyTable,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Apply one micro-batch: returns the number of novel documents
    appended.  Usable directly for batch backfills too."""
    if not batch_df.limit(1).count():
        return 0
    w = Window.partitionBy("fp").orderBy(id_col)
    fresh = (
        batch_df.withColumn("fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
    seen = fingerprints.read()
    novel = fresh.join(seen, "fp", "left_anti")
    # one pass over the novel rows feeds both commits
    novel = novel.localCheckpoint(eager=True)
    n = novel.count()
    if n:
        corpus.append(novel.drop("fp"))
        fingerprints.append(novel.select("fp"))
    return n


def start_dedup_ingest(
    spark: SparkSession,
    inbox_dir: str,
    schema,
    corpus: HyTable,
    fingerprints: HyTable,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Tail ``inbox_dir`` (file stream) and dedup-ingest every
    micro-batch into ``corpus``, maintaining the ``fingerprints`` state
    table.  Exactly-once per inbox file via the checkpoint; duplicate
    content across redeliveries is dropped by the state anti-join."""

    def drain(batch_df: DataFrame, _batch_id: int) -> None:
        dedup_ingest_batch(batch_df, corpus, fingerprints, text_col, id_col)

    writer = (
        spark.readStream.schema(schema)
        .parquet(inbox_dir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
