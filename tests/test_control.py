"""Control plane: registry, router (incl. region-failover scenario), gate
(quorum scenario), tokens, leases — per the reference's test scenarios
(FIXTURES.md §D, SimpleE2ESpec region failure/fallback)."""

import pytest

from iceberg_hybrid_spark.control.gate import CommitGate, GateDecision
from iceberg_hybrid_spark.control.leases import LeaseStore
from iceberg_hybrid_spark.control.registry import (
    ACTIVE,
    FAILED,
    Region,
    Registry,
    StorageLocation,
)
from iceberg_hybrid_spark.control.router import (
    ReadRouter,
    RoutingPolicy,
    TableNotFound,
)
from iceberg_hybrid_spark.control.tokens import ConsistencyToken, TokenStore


def make_registry(spark):
    reg = Registry(spark)
    for rid in ("us-east-1", "eu-west-1", "ap-south-1"):
        reg.register_region(
            Region(rid, rid.upper()),
            StorageLocation(rid, f"https://{rid}.example", f"bucket-{rid}", "warehouse"),
        )
    reg.register_table_location("analytics.user_events", "us-east-1", "bucket-us-east-1/warehouse/analytics/user_events")
    reg.register_table_location("analytics.user_events", "eu-west-1", "bucket-eu-west-1/warehouse/analytics/user_events")
    return reg


def test_registry_lookups(spark):
    reg = make_registry(spark)
    assert reg.get_table_regions("analytics.user_events") == ["eu-west-1", "us-east-1"]
    assert reg.get_region_tables("us-east-1") == ["analytics.user_events"]
    assert reg.get_table_data_path("analytics.user_events", "eu-west-1").startswith("bucket-eu")
    assert reg.get_active_regions() == ["ap-south-1", "eu-west-1", "us-east-1"]


def test_registry_batch_accounting(spark):
    reg = make_registry(spark)
    result = reg.register_batch([
        ("t1", "us-east-1", "p1"),
        ("t2", "nope-region", "p2"),  # fails: unknown region
        ("t3", "eu-west-1", "p3"),
    ])
    assert result.successful == 2
    assert result.failed == 1
    assert "nope-region" in result.errors[0]


def test_registry_batch_lookup_df(spark):
    reg = make_registry(spark)
    req = spark.createDataFrame(
        [("analytics.user_events", "us-east-1"), ("missing.tbl", "us-east-1")],
        "table_name string, region string",
    )
    rows = {r.table_name: r.data_path for r in reg.get_table_data_paths_batch(req).collect()}
    assert rows["analytics.user_events"] is not None
    assert rows["missing.tbl"] is None


def test_router_prefers_healthy_preferred_region(spark):
    reg = make_registry(spark)
    router = ReadRouter(reg)
    loc = router.route_read("analytics.user_events", "eu-west-1")
    assert loc.region == "eu-west-1"


def test_router_region_failover_and_recovery(spark):
    """≙ SimpleE2ESpec.scala:81-122: EU fails → route falls back to US;
    EU restored → routes back."""
    reg = make_registry(spark)
    router = ReadRouter(reg, storage_health={"eu-west-1": 0.0})
    reg.update_region_status("eu-west-1", FAILED)
    loc = router.route_read("analytics.user_events", "eu-west-1")
    assert loc.region == "us-east-1"
    # recovery
    router.storage_health["eu-west-1"] = 1.0
    reg.update_region_status("eu-west-1", ACTIVE)
    assert router.route_read("analytics.user_events", "eu-west-1").region == "eu-west-1"


def test_router_unknown_table(spark):
    router = ReadRouter(make_registry(spark))
    with pytest.raises(TableNotFound):
        router.route_read("no.such_table")


def test_score_weights(spark):
    """0.7*storage + 0.3*activity with the reference's exact weights."""
    reg = make_registry(spark)
    router = ReadRouter(reg, storage_health={"us-east-1": 0.5})
    assert router.score_region("us-east-1") == pytest.approx(0.7 * 0.5 + 0.3)
    reg.update_region_status("us-east-1", FAILED)
    assert router.score_region("us-east-1") == pytest.approx(0.7 * 0.5 + 0.3 * 0.3)


def test_scores_df_matches_scalar(spark):
    reg = make_registry(spark)
    router = ReadRouter(reg, storage_health={"eu-west-1": 0.4})
    rows = {r.region: r.score for r in router.scores_df().collect()}
    for rid in ("us-east-1", "eu-west-1", "ap-south-1"):
        assert rows[rid] == pytest.approx(router.score_region(rid), abs=1e-6)


def test_get_data_files_path_rewrite(spark):
    """≙ getDataFiles base-path rewrite (ReadRouter.java:186-189)."""
    reg = make_registry(spark)
    router = ReadRouter(reg)
    files = spark.createDataFrame(
        [("data/abc/part-000.parquet",), ("data/abc/part-001.parquet",)],
        "file_path string",
    )
    out = router.get_data_files("analytics.user_events", files, "eu-west-1").collect()
    for r in out:
        assert r.serving_region == "eu-west-1"
        assert r.serving_path.startswith("bucket-eu-west-1/warehouse/analytics/user_events/")
        assert r.serving_path.endswith(r.file_path.split("/")[-1])


def test_token_routing_policies(spark):
    route = ReadRouter.route_with_token
    # mirror caught up → CLOUD under MEET_WATERMARK
    assert route(100, 200) == "CLOUD"
    assert route(300, 200) == "ONPREM"
    assert route(300, None) == "ONPREM"
    assert route(100, 200, RoutingPolicy.PREFER_ONPREM) == "ONPREM"
    assert route(100, 200, RoutingPolicy.PREFER_CLOUD) == "CLOUD"


def test_token_store_monotonic(spark):
    store = TokenStore(spark)
    store.save_token(ConsistencyToken("t", 1000, 5))
    store.save_token(ConsistencyToken("t", 2000, 6))
    with pytest.raises(ValueError, match="regression"):
        store.save_token(ConsistencyToken("t", 500, 2))
    assert store.load_token("t").last_applied_sequence == 6


def test_commit_gate_quorum(spark):
    """≙ quorum scenario: 3 required regions, all must approve."""
    gate = CommitGate(spark, {"t": ("r1", "r2", "r3")})
    st = gate.request_commit_approval("req1", "t", "c1")
    assert st.decision == GateDecision.PENDING
    gate.approve_commit("req1", "r1")
    gate.approve_commit("req1", "r2")
    st = gate.approve_commit("req1", "r3")
    assert st.decision == GateDecision.APPROVED
    assert st.approved_regions == ("r1", "r2", "r3")


def test_commit_gate_any_rejection_kills(spark):
    gate = CommitGate(spark, {"t": ("r1", "r2", "r3")})
    gate.request_commit_approval("req1", "t", "c1")
    gate.approve_commit("req1", "r1")
    st = gate.reject_commit("req1", "r2")
    assert st.decision == GateDecision.REJECTED


def test_commit_gate_quorum_df_agrees(spark):
    gate = CommitGate(spark, {"t": ("r1", "r2")})
    gate.request_commit_approval("reqA", "t", "c1")
    gate.approve_commit("reqA", "r1")
    gate.approve_commit("reqA", "r2")
    gate.request_commit_approval("reqB", "t", "c2")
    gate.reject_commit("reqB", "r1")
    decisions = {r.request_id: r.decision for r in gate.quorum_df().collect()}
    assert decisions == {"reqA": "Approved", "reqB": "Rejected"}


def test_gate_auto_approves_without_quorum_config(spark):
    gate = CommitGate(spark)
    st = gate.request_commit_approval("req1", "unknown.table", "c1")
    assert st.decision == GateDecision.APPROVED


def test_leases(spark):
    store = LeaseStore(spark)
    l1 = store.create("t", 3, "query-1", ttl_s=60)
    store.create("t", 5, "query-2", ttl_s=60)
    expired = store.create("t", 1, "query-0", ttl_s=0)
    active = store.list_active()
    assert {l.lease_id for l in active} == {l1.lease_id} | {
        l.lease_id for l in active if l.holder == "query-2"
    }
    assert expired.lease_id not in {l.lease_id for l in active}
    assert store.min_leased_seq("t") == 3
    store.release(l1.lease_id)
    assert store.min_leased_seq("t") == 5
