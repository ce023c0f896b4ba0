"""Nightly table-maintenance golden path: the scheduled upkeep cycle a
production lakehouse runs against every table — compaction → ref-aware
snapshot expiry → tiered orphan GC → L2 closure audit — chained on one
table, asserting reads stay identical through every stage.

Mirrors the reference's scenario-E2E layer (SURVEY §5): components are
each unit-tested elsewhere; this pins their composition, which is where
maintenance bugs (expiry deleting branch files, GC deleting fresh
orphans, compaction resurrecting MOR-deleted rows) actually bite.
"""

import os
import time

from iceberg_hybrid_spark.lake import gc as G
from iceberg_hybrid_spark.lake import replication as R
from iceberg_hybrid_spark.lake.table import HyTable


def test_nightly_maintenance_cycle(spark, tmp_path):
    t = HyTable(spark, str(tmp_path / "tbl"))

    # a week of activity: create, appends (small files), MOR delete,
    # a pinned audit tag, a lagging branch
    t.create(spark.range(0, 1000).selectExpr("id", "id % 7 AS grp").repartition(8))
    for lo in range(1000, 1300, 100):
        t.append(spark.range(lo, lo + 100).selectExpr("id", "id % 7 AS grp"))
    t.delete_where_mor([("grp", "=", 3)], delete_cols=["id"])
    t.create_tag("audit-week32")
    t.create_branch("eu-lag", seq=2)
    expected = t.read().count()
    tag_expected = t.read_tag("audit-week32").count()
    branch_expected = t.read_branch("eu-lag").count()

    # stray debris: an old tmp orphan (P3D tier, already due) and a
    # fresh data orphan (P14D tier, must survive)
    old = time.time() - 5 * 86_400
    tmp_dir = os.path.join(t.data_dir, "_tmp")
    os.makedirs(tmp_dir)
    tmp_orphan = os.path.join(tmp_dir, "leftover.parquet")
    fresh_orphan = os.path.join(t.data_dir, "fresh-stray.parquet")
    for p in (tmp_orphan, fresh_orphan):
        with open(p, "wb") as f:
            f.write(b"junk")
    os.utime(tmp_orphan, (old, old))

    # 1) compaction: small files fold into target-size files and MOR
    # deletes materialize; the read is unchanged
    snap = t.rewrite_data_files(target_file_size_bytes=1 << 30)
    assert all(f.content == "data" for f in snap.manifest)
    assert t.read().count() == expected

    # 2) ref-aware expiry: old snapshots go, but the tag + branch heads
    # (and their exclusive files) survive
    res = t.expire_snapshots(retain_last=1)
    assert res["expired_snapshots"] > 0
    assert t.read().count() == expected
    assert t.read_tag("audit-week32").count() == tag_expected
    assert t.read_branch("eu-lag").count() == branch_expected

    # 3) tiered orphan GC through the producer/executor path: the aged
    # tmp orphan is due (P3D), the fresh data orphan is not (P14D)
    now = int(time.time() * 1000)
    gen = now - 400_000
    cands = [c for c in G.produce_candidates(t, retain_last=1, now_ms=gen)
             if c.reason == "orphan"]
    plan = G.DeletePlan(t.root, cands, generated_at_ms=gen,
                        valid_from_ms=gen, valid_until_ms=now + 10**7)
    results = {e.file_uri: e.result
               for e in G.apply_delete_plan(plan, safety_delay_s=60, now_ms=now)}
    assert results["data/_tmp/leftover.parquet"] == "deleted"
    assert results["data/fresh-stray.parquet"] == "blocked_window"
    assert not os.path.exists(tmp_orphan)
    assert os.path.exists(fresh_orphan)

    # 4) L2 closure audit over everything retained (head + tag + branch
    # snapshots): maintenance must leave a fully verifiable closure
    report = R.audit_closure(t)  # raises VerificationError on violation
    assert report["files_checked"] > 0
    assert report["snapshots_audited"] >= 3  # head + tag + branch heads

    # reads still identical after the full cycle
    assert t.read().count() == expected
    assert t.read_tag("audit-week32").count() == tag_expected
    assert t.read_branch("eu-lag").count() == branch_expected


def test_catalog_wide_maintenance(spark, tmp_path):
    """run_maintenance sweeps every table: fragmented tables compact,
    history expires, aged tmp orphans go, and a corrupt table's audit
    failure is recorded without blocking the other tables' cycles."""
    from iceberg_hybrid_spark.lake.catalog import HyCatalog

    cat = HyCatalog(spark, str(tmp_path / "wh"))
    frag = cat.create_table("a.fragmented", spark.range(0, 500).toDF("id").repartition(12))
    for lo in range(500, 800, 100):
        frag.append(spark.range(lo, lo + 100).toDF("id"))
    small = cat.create_table("a.small", spark.range(0, 10).toDF("id").coalesce(1))
    bad = cat.create_table("b.corrupt", spark.range(0, 50).toDF("id").coalesce(1))
    victim = os.path.join(bad.root, bad.current_snapshot().manifest[0].path)
    data = open(victim, "rb").read()
    with open(victim, "r+b") as f:
        f.seek(len(data) // 2)
        f.write(bytes([data[len(data) // 2] ^ 0xFF]))
    old = time.time() - 5 * 86_400
    tmp_dir = os.path.join(frag.data_dir, "_tmp")
    os.makedirs(tmp_dir)
    orphan = os.path.join(tmp_dir, "junk.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    os.utime(orphan, (old, old))

    # a fragmented AND corrupt table: compaction itself blows up (a
    # Spark error, not a VerificationError) — must be isolated too
    broken = cat.create_table("c.broken", spark.range(0, 400).toDF("id").repartition(9))
    bfile = os.path.join(broken.root, broken.current_snapshot().manifest[0].path)
    with open(bfile, "wb") as f:
        f.write(b"not parquet at all")

    reports = {r["table"]: r for r in cat.run_maintenance(retain_last=1)}
    assert reports["a.fragmented"]["compacted"] is True
    assert reports["a.fragmented"]["expired_snapshots"] > 0
    assert reports["a.fragmented"]["orphans_removed"] == 1
    assert reports["a.fragmented"]["audit_ok"] is True
    assert not os.path.exists(orphan)
    assert reports["a.small"]["compacted"] is False
    assert reports["a.small"]["audit_ok"] is True
    assert reports["b.corrupt"]["audit_ok"] is False
    assert "checksum" in reports["b.corrupt"]["audit_error"]
    assert "error" in reports["c.broken"]          # isolated, not raised
    assert len(reports) == 4                       # every table got a row
    # data unharmed where audits passed
    assert frag.read().count() == 800
    assert small.read().count() == 10


def test_maintenance_respects_lease_floor(spark, tmp_path):
    """The nightly sweep with a lease_floor resolver must keep every
    snapshot at/after the oldest leased sequence — version file AND
    data files — while an unleased table expires normally; releasing
    the lease lets the next cycle reclaim."""
    from iceberg_hybrid_spark.control.leases import LeaseStore
    from iceberg_hybrid_spark.lake.catalog import HyCatalog

    cat = HyCatalog(spark, str(tmp_path / "wh"))
    leased = cat.create_table(
        "a.leased", spark.range(0, 100).toDF("id").coalesce(1)
    )
    for lo in (100, 200, 300):
        leased.overwrite(spark.range(lo, lo + 50).toDF("id").coalesce(1))
    free = cat.create_table(
        "a.free", spark.range(0, 100).toDF("id").coalesce(1)
    )
    for lo in (100, 200, 300):
        free.overwrite(spark.range(lo, lo + 50).toDF("id").coalesce(1))

    leases = LeaseStore(spark)
    lease = leases.create("a.leased", snapshot_seq=2, holder="bi", ttl_s=3600)
    floor = lambda t: leases.min_leased_seq(t)  # noqa: E731

    reports = {
        r["table"]: r
        for r in cat.run_maintenance(retain_last=1, lease_floor=floor)
    }
    # snapshots 2..4 survive on the leased table (floor), only 1 expires
    assert reports["a.leased"]["expired_snapshots"] == 1
    # the unleased twin expires its full pre-window history
    assert reports["a.free"]["expired_snapshots"] == 3
    # the leased reader still time-travels to its pinned snapshot
    assert cat.load_table("a.leased").read(seq=2).count() == 50
    # released lease -> the next cycle reclaims what the floor protected
    leases.release(lease.lease_id)
    reports2 = {
        r["table"]: r
        for r in cat.run_maintenance(retain_last=1, lease_floor=floor)
    }
    assert reports2["a.leased"]["expired_snapshots"] == 2


def test_maintenance_acts_on_index_staleness(spark, tmp_path):
    """The nightly sweep consumes the ANN drift counter: appends past
    the declared threshold raise a rebuild recommendation in the table's
    report; with a rebuild callable supplied, the sweep rebuilds (atomic
    overwrite — the FAISS retrain step) and the staleness base resets so
    the following cycle has nothing to recommend."""
    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.functions import similarity as S
    from iceberg_hybrid_spark.lake.catalog import HyCatalog
    from iceberg_hybrid_spark.lake.table import HyTable
    from iceberg_hybrid_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 7)
    delta = emb.filter(F.col("vec_id") % 10 == 7)
    coded, codebooks, sub = S.pq_build(base, m=4, k=16, seed=42)
    cat = HyCatalog(spark, str(tmp_path / "wh"))
    codes_t = HyTable(spark, os.path.join(cat.warehouse, "ann", "codes"))
    books_t = HyTable(spark, os.path.join(cat.warehouse, "ann", "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)
    S.pq_append_index(delta, codes_t, books_t)

    # recommendation only: staleness recorded, nothing rebuilt
    reports = {
        r["table"]: r
        for r in cat.run_maintenance(
            ann_indexes={"ann.codes": {"threshold": 0.05}}
        )
    }
    rep = reports["ann.codes"]
    assert rep["index_rebuild_recommended"]
    assert rep["index_staleness"] > 0.05
    assert "index_rebuilt" not in rep
    assert "index_staleness" not in reports["ann.books"]

    # auto-rebuild behind the flag: the sweep rebuilds and the drift
    # base resets
    def rebuild(t):
        union_coded = S.pq_encode(emb, codebooks, sub)
        S.pq_write_index(union_coded, codebooks, t, books_t)

    opts = {"ann.codes": {"threshold": 0.05, "rebuild": rebuild}}
    rep = {
        r["table"]: r for r in cat.run_maintenance(ann_indexes=opts)
    }["ann.codes"]
    assert rep["index_rebuilt"]
    assert rep["index_staleness_after_rebuild"] == 0.0
    assert cat.load_table("ann.codes").read().count() == emb.count()

    # the following cycle finds a fresh index: nothing to do
    rep = {
        r["table"]: r for r in cat.run_maintenance(ann_indexes=opts)
    }["ann.codes"]
    assert not rep["index_rebuild_recommended"]
    assert "index_rebuilt" not in rep


def test_maintenance_staleness_survives_expiry(spark, tmp_path):
    """Regression (r11 advisor): with more appends than retain_last the
    sweep's own snapshot expiry used to drop the rebuild (create) snapshot
    BEFORE index_staleness read it as the drift base — the resulting
    error was swallowed into rep['error'] and staleness reporting,
    auto-rebuild, and the closure audit were all silently skipped for
    exactly the stale indexes the feature targets.  Staleness now runs
    before expiry, so one sweep both reports drift and rebuilds even
    when the drift base is about to leave the retention window."""
    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.functions import similarity as S
    from iceberg_hybrid_spark.lake.catalog import HyCatalog
    from iceberg_hybrid_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter(F.col("vec_id") % 10 == 0)
    coded, codebooks, sub = S.pq_build(base, m=4, k=16, seed=42)
    cat = HyCatalog(spark, str(tmp_path / "wh"))
    codes_t = HyTable(spark, os.path.join(cat.warehouse, "ann", "codes"))
    books_t = HyTable(spark, os.path.join(cat.warehouse, "ann", "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)
    # four appends > retain_last=3: the create snapshot (the drift
    # base) falls outside the retention window this very sweep
    for digit in (1, 2, 3, 4):
        S.pq_append_index(
            emb.filter(F.col("vec_id") % 10 == digit), codes_t, books_t
        )

    def rebuild(t):
        union_coded = S.pq_encode(
            emb.filter(F.col("vec_id") % 10 <= 4), codebooks, sub
        )
        S.pq_write_index(union_coded, codebooks, t, books_t)

    opts = {"ann.codes": {"threshold": 0.05, "rebuild": rebuild}}
    rep = {
        r["table"]: r
        for r in cat.run_maintenance(retain_last=3, ann_indexes=opts)
    }["ann.codes"]
    assert "error" not in rep, rep
    # staleness measured off the true (pre-expiry) drift base: 4 of 5
    # cohorts appended
    assert rep["index_staleness"] > 0.7
    assert rep["index_rebuilt"]
    assert rep["index_staleness_after_rebuild"] == 0.0
    assert rep["audit_ok"]
    # the rebuild overwrite committed before expiry, so it is the
    # newest snapshot and the post-sweep log retains the fresh base
    st = S.index_staleness(cat.load_table("ann.codes"))
    assert st["staleness"] == 0.0


def test_index_staleness_fallback_without_rebuild_snapshot(spark, tmp_path):
    """When expiry (run by some other path) has already dropped every
    create/overwrite snapshot from the log, index_staleness falls back
    to the OLDEST retained snapshot as the drift base — a conservative
    lower bound — instead of raising on an empty rebuild set."""
    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.functions import similarity as S
    from iceberg_hybrid_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter(F.col("vec_id") % 10 == 0)
    coded, codebooks, sub = S.pq_build(base, m=4, k=16, seed=42)
    codes_t = HyTable(spark, str(tmp_path / "codes"))
    books_t = HyTable(spark, str(tmp_path / "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)
    for digit in (1, 2, 3, 4):
        S.pq_append_index(
            emb.filter(F.col("vec_id") % 10 == digit), codes_t, books_t
        )
    # externally-run expiry drops the create snapshot (5 snapshots,
    # retain 2 -> only the last two appends survive)
    codes_t.expire_snapshots(retain_last=2)
    st = S.index_staleness(codes_t)
    # base = oldest retained (after 3 appends), drift = the 4th append:
    # a LOWER bound on the true 4/5 staleness, and strictly positive
    assert 0.0 < st["staleness"] < 0.8
