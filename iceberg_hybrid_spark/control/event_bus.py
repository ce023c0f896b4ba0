"""In-process pub/sub event bus with typed subscriptions.

≙ reference EventPort (legacy-java/ports-java/.../EventPort.java:20-101):
publish / publishAsync / subscribe (all-events and type-safe overload) /
unsubscribe / unsubscribeMatching / unsubscribeFromTopic /
getSubscriptionTopic / isConnected / close.

Control-plane only: the bus routes small coordination events (commit
notifications, sync triggers) between components in one process — the
data plane never flows through it.  The streaming twin of this surface is
``streaming/sync_stream.py`` (events as an unbounded DataFrame).
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class _Subscription:
    sub_id: str
    topic: str
    handler: Callable[[object], None]
    event_type: type | None = None  # None = all event types


@dataclass
class EventBus:
    _subs: dict[str, _Subscription] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _connected: bool = True

    def publish(self, topic: str, event: object) -> int:
        """Synchronous publish: delivers to every matching subscription
        before returning; returns the delivery count.  A typed
        subscription only receives events that are instances of its
        declared type (EventPort's type-safe subscribe overload)."""
        if not self._connected:
            raise RuntimeError("event bus is closed")
        with self._lock:
            targets = [
                s for s in self._subs.values()
                if s.topic == topic
                and (s.event_type is None or isinstance(event, s.event_type))
            ]
        for s in targets:
            s.handler(event)
        return len(targets)

    def publish_async(self, topic: str, event: object) -> threading.Thread:
        """Fire-and-forget publish on a daemon thread (≙ publishAsync)."""
        if not self._connected:
            raise RuntimeError("event bus is closed")
        t = threading.Thread(target=self.publish, args=(topic, event), daemon=True)
        t.start()
        return t

    def subscribe(
        self,
        topic: str,
        handler: Callable[[object], None],
        event_type: type | None = None,
    ) -> str:
        """Register a handler; ``event_type`` narrows delivery to that
        type.  Returns the subscription id used for unsubscribe."""
        if not self._connected:
            raise RuntimeError("event bus is closed")
        sub = _Subscription(f"sub-{uuid.uuid4().hex[:12]}", topic, handler, event_type)
        with self._lock:
            self._subs[sub.sub_id] = sub
        return sub.sub_id

    def unsubscribe(self, sub_id: str) -> bool:
        with self._lock:
            return self._subs.pop(sub_id, None) is not None

    def unsubscribe_matching(self, predicate: Callable[[str], bool]) -> int:
        """Remove every subscription whose ID matches; returns the count
        (≙ unsubscribeMatching)."""
        with self._lock:
            doomed = [sid for sid in self._subs if predicate(sid)]
            for sid in doomed:
                del self._subs[sid]
        return len(doomed)

    def unsubscribe_from_topic(self, topic: str) -> int:
        """≙ the unsubscribeFromTopic default method."""
        return self.unsubscribe_matching(
            lambda sid: self.subscription_topic(sid) == topic
        )

    def subscription_topic(self, sub_id: str) -> str | None:
        sub = self._subs.get(sub_id)
        return sub.topic if sub else None

    def is_connected(self) -> bool:
        return self._connected

    def close(self) -> None:
        """Unsubscribe everything and refuse further use (≙ close)."""
        with self._lock:
            self._subs.clear()
        self._connected = False
