from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query: Spark builder + optional DuckDB oracle SQL."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def all_specs() -> dict[str, QuerySpec]:
    """Assemble the full registry (imported lazily to keep startup light)."""
    from . import advanced as _advanced
    from . import events as _events
    from . import functions_showcase as _showcase
    from . import lake_ops as _lake_ops
    from . import llm as _llm
    from . import multimodal as _multimodal
    from . import pipeline as _pipeline
    from . import relational as _relational

    # Interleave families round-robin rather than concatenating whole
    # modules: if a harness caps the number of queries it checks per run,
    # every operator family still lands inside the first N entries.
    modules = (
        _relational, _events, _llm, _pipeline, _advanced, _multimodal,
        _lake_ops, _showcase,
    )
    specs: dict[str, QuerySpec] = {}
    queues = [list(mod.SPECS) for mod in modules]
    while any(queues):
        for queue in queues:
            if not queue:
                continue
            spec = queue.pop(0)
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name!r}")
            specs[spec.name] = spec
    return specs
