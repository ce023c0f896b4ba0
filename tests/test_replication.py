"""Replication pipeline: plan/copy/verify/promote + scenario tests from the
reference's golden paths (FIXTURES.md §D)."""

import os

import pytest

from iceberg_hybrid_spark.lake import replication as R
from iceberg_hybrid_spark.lake.table import HyTable


def make_df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "CAST(id AS STRING) AS s")


@pytest.fixture()
def src_dst(spark, tmp_path):
    src = HyTable(spark, str(tmp_path / "us_east" / "tbl"))
    dst = HyTable(spark, str(tmp_path / "eu_west" / "tbl"))
    return src, dst


def test_plan_full_snapshot_for_empty_dest(spark, src_dst):
    src, dst = src_dst
    src.create(make_df(spark, 0, 100))
    todo = R.plan(src, dst)
    assert {f.path for f in todo} == {f.path for f in src.current_snapshot().manifest}


def test_replicate_end_to_end(spark, src_dst):
    """≙ HappyPathInMemoryTest: commit → plan → copy → verify → promote →
    read routes to the mirror with identical data."""
    src, dst = src_dst
    src.create(make_df(spark, 0, 100))
    published, metrics = R.replicate(spark, src, dst)
    assert published is not None and not published.staged
    assert metrics.files_copied == len(src.current_snapshot().manifest)
    assert metrics.bytes_copied > 0
    # data consistency: byte-equality of row sets across regions
    assert sorted(r.id for r in dst.read().collect()) == sorted(
        r.id for r in src.read().collect()
    )


def test_replicate_incremental_skips_existing(spark, src_dst):
    """Second sync copies only the diff (skip-if-exists dedup)."""
    src, dst = src_dst
    src.create(make_df(spark, 0, 100))
    R.replicate(spark, src, dst)
    src.append(make_df(spark, 100, 150))
    n_total = len(src.current_snapshot().manifest)
    todo = R.plan(src, dst)
    assert 0 < len(todo) < n_total  # only the appended files
    _, metrics = R.replicate(spark, src, dst)
    assert metrics.files_copied == len(todo)
    assert dst.read().count() == 150


def test_verify_catches_corruption(spark, src_dst):
    """≙ StateReconciler: size mismatch must fail promotion, mirror stays
    on its previous visible snapshot."""
    src, dst = src_dst
    src.create(make_df(spark, 0, 100))
    todo = R.plan(src, dst)
    R.copy_files(spark, src.root, dst.root, todo)
    # corrupt one replicated file
    victim = os.path.join(dst.root, todo[0].path)
    with open(victim, "ab") as f:
        f.write(b"x")
    staged = dst._make_snapshot(
        "append", src.current_snapshot().manifest, "id BIGINT", staged=True
    )
    dst._commit(staged)
    with pytest.raises(R.VerificationError, match="size mismatch"):
        R.verify(dst, staged)
    assert dst.current_snapshot() is None  # nothing promoted


def test_verify_missing_file(spark, src_dst):
    src, dst = src_dst
    src.create(make_df(spark, 0, 10))
    staged = dst._make_snapshot(
        "append", src.current_snapshot().manifest, "id BIGINT", staged=True
    )
    dst._commit(staged)
    with pytest.raises(R.VerificationError, match="missing"):
        R.verify(dst, staged)


def test_sampled_l0_verification(spark, src_dst):
    """L0 tier: sampled check passes on a healthy prefix."""
    src, dst = src_dst
    src.create(make_df(spark, 0, 100))
    R.replicate(spark, src, dst)
    R.verify(dst, dst.current_snapshot(), sample_fraction=0.5)  # no raise


def test_fast_forward_diff(spark, src_dst):
    """Lagging mirror syncs vK→vN directly, skipping intermediates."""
    src, dst = src_dst
    src.create(make_df(spark, 0, 50))
    R.replicate(spark, src, dst)
    src.append(make_df(spark, 50, 100))
    src.append(make_df(spark, 100, 200))
    src.append(make_df(spark, 200, 300))
    _, metrics = R.replicate(spark, src, dst)  # one hop to latest
    assert dst.read().count() == 300
    # files from the first sync were not re-copied
    assert metrics.files_skipped == 0
    assert metrics.files_copied < len(src.current_snapshot().manifest)
