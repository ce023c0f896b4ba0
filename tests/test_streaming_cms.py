"""Streaming count-min ingestion: exactly-once-effect counting under
at-least-once delivery (dedup-before-fold + the batch_seq torn-batch
discipline) — the additive dual of the idempotent HLL state path."""

import pytest

from pyspark.sql import functions as F

from iceberg_hybrid_spark.lake.table import HyTable
from iceberg_hybrid_spark.streaming.ingest import (
    CMS_CELL_DDL,
    FINGERPRINT_DDL,
    cms_ingest_batch,
)

DOC_SCHEMA = "doc_id bigint, text string"


@pytest.fixture
def tables(spark, tmp_path):
    counted = HyTable(spark, str(tmp_path / "counted"))
    counted.create(spark.createDataFrame([], FINGERPRINT_DDL))
    cells = HyTable(spark, str(tmp_path / "cells"))
    cells.create(spark.createDataFrame([], CMS_CELL_DDL))
    return counted, cells


def _estimate(spark, cells, token: str) -> int:
    probes = spark.createDataFrame([(token, r) for r in range(4)], "w string, r int")
    from iceberg_hybrid_spark.functions import sketch as SK

    addressed = probes.select(
        "r",
        F.md5(F.concat(F.col("w"), F.lit(":"), F.col("r").cast("string"))).alias("m"),
    ).selectExpr("r", f"{SK.HEX_INT} % 1024 AS cell")
    hit = addressed.join(cells.read(), ["r", "cell"]).agg(F.min("cnt")).collect()[0][0]
    return int(hit or 0)


def test_counts_and_redelivery(spark, tables):
    counted, cells = tables
    batch = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], DOC_SCHEMA
    )
    assert cms_ingest_batch(batch, counted, cells) == 2
    assert _estimate(spark, cells, "alpha") == 2
    assert _estimate(spark, cells, "beta") == 2
    assert _estimate(spark, cells, "gamma") == 1

    # verbatim re-delivery (a new inbox file with the same content):
    # sum is not idempotent, so the fingerprint anti-join must drop it
    assert cms_ingest_batch(batch, counted, cells) == 0
    assert _estimate(spark, cells, "alpha") == 2
    assert _estimate(spark, cells, "beta") == 2


def test_within_batch_duplicates_counted_once(spark, tables):
    counted, cells = tables
    batch = spark.createDataFrame(
        [(1, "delta epsilon"), (2, "delta epsilon"), (3, "zeta")], DOC_SCHEMA
    )
    assert cms_ingest_batch(batch, counted, cells) == 2  # one copy per text
    assert _estimate(spark, cells, "delta") == 1
    assert _estimate(spark, cells, "zeta") == 1


def test_torn_batch_fold_not_reapplied(spark, tables):
    """Crash between the cells overwrite and the fingerprint append: the
    retry must see the fold already at batch_seq == expected and skip
    it — re-folding would double every count."""
    counted, cells = tables
    cms_ingest_batch(
        spark.createDataFrame([(1, "eta theta")], DOC_SCHEMA), counted, cells
    )

    batch2 = spark.createDataFrame([(2, "eta iota")], DOC_SCHEMA)
    real_append = counted.append
    calls = {"n": 0}

    def dying_append(df):
        calls["n"] += 1
        raise RuntimeError("simulated crash before fingerprint commit")

    counted.append = dying_append
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            cms_ingest_batch(batch2, counted, cells)
    finally:
        counted.append = real_append
    assert calls["n"] == 1
    # cells were folded by the torn attempt...
    assert _estimate(spark, cells, "iota") == 1

    # ...so the retry must NOT fold again (eta would become 3)
    assert cms_ingest_batch(batch2, counted, cells) == 1
    assert _estimate(spark, cells, "eta") == 2
    assert _estimate(spark, cells, "iota") == 1

    # and a subsequent fresh batch still folds normally
    assert cms_ingest_batch(
        spark.createDataFrame([(3, "eta kappa")], DOC_SCHEMA), counted, cells
    ) == 1
    assert _estimate(spark, cells, "eta") == 3
    assert _estimate(spark, cells, "kappa") == 1


def test_one_batch_fold_equals_two_batch_fold(spark, tables):
    """availableNow may fold the re-delivery into the SAME micro-batch
    or a separate one — the fp-window within-batch dedup must make both
    folds produce identical state (the batch-fold-independence claim
    streaming_cms_ingest's oracle relies on)."""
    counted, cells = tables
    rows = [(1, "lambda mu"), (2, "mu nu")]
    doubled = spark.createDataFrame(rows + rows, DOC_SCHEMA)  # one-batch fold
    assert cms_ingest_batch(doubled, counted, cells) == 2
    assert _estimate(spark, cells, "lambda") == 1
    assert _estimate(spark, cells, "mu") == 2
    assert _estimate(spark, cells, "nu") == 1


def test_torn_batch_nonverbatim_replay_raises(spark, tables):
    """The skip-if-folded rule is content-guarded: a torn fold followed
    by a DIFFERENT batch reaching the same expected sequence (deleted
    checkpoint / direct API misuse) must raise, not silently skip the
    new batch's fold — that skip would permanently undercount the new
    documents' tokens with no signal anywhere."""
    counted, cells = tables
    cms_ingest_batch(
        spark.createDataFrame([(1, "omega psi")], DOC_SCHEMA), counted, cells
    )

    real_append = counted.append

    def dying_append(df):
        raise RuntimeError("simulated crash before fingerprint commit")

    counted.append = dying_append
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            cms_ingest_batch(
                spark.createDataFrame([(2, "omega chi")], DOC_SCHEMA),
                counted,
                cells,
            )
    finally:
        counted.append = real_append

    # NON-verbatim replay at the same expected sequence: different text
    with pytest.raises(RuntimeError, match="DIFFERENT novel set"):
        cms_ingest_batch(
            spark.createDataFrame([(2, "omega phi")], DOC_SCHEMA),
            counted,
            cells,
        )
    # the verbatim replay still completes the torn commit
    assert cms_ingest_batch(
        spark.createDataFrame([(2, "omega chi")], DOC_SCHEMA), counted, cells
    ) == 1
    assert _estimate(spark, cells, "omega") == 2
    assert _estimate(spark, cells, "chi") == 1


def test_legacy_state_without_batch_fp_resumes(spark, tmp_path):
    """Read-compat across the batch_fp upgrade: cell state written by the
    pre-guard version has no batch_fp column.  The first post-upgrade
    batch must (a) not raise on the missing column, (b) treat a torn
    legacy fold at the expected sequence as fp-unknown — skip the fold
    and complete the fingerprint append rather than either re-folding
    (double count) or raising (stream stuck until a state rebuild)."""
    LEGACY_DDL = "r int, cell bigint, cnt bigint, batch_seq bigint"
    counted = HyTable(spark, str(tmp_path / "legacy_counted"))
    counted.create(spark.createDataFrame([], FINGERPRINT_DDL))
    cells = HyTable(spark, str(tmp_path / "legacy_cells"))
    cells.create(spark.createDataFrame([], LEGACY_DDL))

    # Scenario A: empty legacy state — the max("batch_fp") probe must not
    # raise; the batch folds normally and upgrades the cell schema.
    batch1 = spark.createDataFrame([(1, "rho sigma")], DOC_SCHEMA)
    assert cms_ingest_batch(batch1, counted, cells) == 1
    assert "batch_fp" in cells.read().columns
    assert _estimate(spark, cells, "rho") == 1

    # Scenario B: torn LEGACY fold — cells already at the expected
    # sequence but written without a fingerprint.  Rebuild that shape by
    # stripping batch_fp from the current state and bumping its seq to
    # what the NEXT batch will expect, as if the old version crashed
    # between its fold and its fingerprint append.
    head = counted.current_snapshot()
    expected_next = (head.sequence_number if head else 0) + 1
    legacy = (
        cells.read()
        .select("r", "cell", "cnt")
        .withColumn("batch_seq", F.lit(expected_next).cast("bigint"))
    )
    cells.overwrite(legacy)
    batch2 = spark.createDataFrame([(2, "tau upsilon")], DOC_SCHEMA)
    # fp-unknown at the expected seq: skip the fold (no double count, no
    # raise), complete the fingerprint append.
    assert cms_ingest_batch(batch2, counted, cells) == 1
    assert _estimate(spark, cells, "rho") == 1  # not re-folded
    # batch2's fps are recorded: a verbatim redelivery is a no-op
    assert cms_ingest_batch(batch2, counted, cells) == 0
