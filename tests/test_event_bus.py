"""Typed pub/sub event bus — ≙ EventPort
(legacy-java/ports-java/.../EventPort.java:20-101)."""

import pytest

from iceberg_hybrid_spark.control.event_bus import EventBus


class CommitEvent:
    def __init__(self, commit_id):
        self.commit_id = commit_id


class SyncEventMsg:
    def __init__(self, table):
        self.table = table


def test_typed_routing_and_unsubscribe():
    bus = EventBus()
    commits, syncs, everything = [], [], []
    sid_commit = bus.subscribe("tbl", commits.append, event_type=CommitEvent)
    bus.subscribe("tbl", syncs.append, event_type=SyncEventMsg)
    bus.subscribe("tbl", everything.append)  # untyped: sees all

    assert bus.publish("tbl", CommitEvent("c1")) == 2   # typed + untyped
    assert bus.publish("tbl", SyncEventMsg("t")) == 2
    assert [e.commit_id for e in commits] == ["c1"]
    assert [e.table for e in syncs] == ["t"]
    assert len(everything) == 2

    # unsubscribe one typed handler; the other two keep receiving
    assert bus.unsubscribe(sid_commit) is True
    assert bus.unsubscribe(sid_commit) is False  # idempotent
    bus.publish("tbl", CommitEvent("c2"))
    assert len(commits) == 1      # no longer delivered
    assert len(everything) == 3


def test_topic_isolation():
    bus = EventBus()
    a, b = [], []
    bus.subscribe("topic-a", a.append)
    bus.subscribe("topic-b", b.append)
    bus.publish("topic-a", 1)
    assert (a, b) == ([1], [])


def test_unsubscribe_matching_and_topic():
    bus = EventBus()
    s1 = bus.subscribe("t1", lambda e: None)
    bus.subscribe("t1", lambda e: None)
    s3 = bus.subscribe("t2", lambda e: None)
    assert bus.unsubscribe_from_topic("t1") == 2
    assert bus.subscription_topic(s1) is None
    assert bus.subscription_topic(s3) == "t2"
    assert bus.unsubscribe_matching(lambda sid: True) == 1


def test_publish_async_delivers():
    bus = EventBus()
    got = []
    bus.subscribe("t", got.append)
    t = bus.publish_async("t", 42)
    t.join(5)
    assert got == [42]


def test_close_clears_and_refuses():
    bus = EventBus()
    bus.subscribe("t", lambda e: None)
    bus.close()
    assert not bus.is_connected()
    with pytest.raises(RuntimeError):
        bus.publish("t", 1)
    with pytest.raises(RuntimeError):
        bus.subscribe("t", lambda e: None)
