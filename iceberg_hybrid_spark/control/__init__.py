from .event_bus import EventBus
from .gate import CommitGate, CommitStatus
from .leases import LeaseStore
from .registry import Region, Registry, StorageLocation
from .router import ReadLocation, ReadRouter, RoutingPolicy
from .tokens import ConsistencyToken, TokenStore

__all__ = [
    "Registry", "Region", "StorageLocation",
    "ReadRouter", "ReadLocation", "RoutingPolicy",
    "CommitGate", "CommitStatus",
    "TokenStore", "ConsistencyToken",
    "LeaseStore",
    "EventBus",
]
