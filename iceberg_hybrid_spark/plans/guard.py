"""Plan-shape guard: static analysis of query plans for the
scale-critical properties the 100 TB posture requires.

Two checks, used by tests/test_plan_shapes.py as a regression sweep over
every registered query (round 2 banned an unbounded broadcast and round
3 reintroduced one in a new spot — this automates the ban):

- **forced unbounded broadcast** (`broadcast_hint_violations`): a
  ``broadcast`` join *hint* whose hinted side derives from a
  corpus-proportional table (lineitem/orders/events/documents/
  embeddings) with no bounding operator (aggregate/limit) in between.
  Detected on the *optimized logical plan*, where hints survive as
  ``(strategy=broadcast)`` markers.  A stats-driven BroadcastHashJoin
  chosen by Catalyst at a small scale factor is NOT a violation — with
  100 TB statistics the planner would shuffle instead; only a hint
  forces the broadcast at every scale.
- **all-pairs join** (`all_pairs_joins`): ``CartesianProduct`` /
  ``BroadcastNestedLoopJoin`` in the physical plan.  Bounded-by-contract
  baselines (single query vector, literal query batch) are whitelisted
  at the call site.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# tables whose size grows with the corpus — never force-broadcast raw
BIG_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

# a column that appears in (only) that table's relation line
_TABLE_SIGNATURE = {
    "lineitem": "l_orderkey#",
    "orders": "o_orderkey#",
    "events": "event_id#",
    "documents": "doc_id#",
    "embeddings": "vec_id#",
}

# logical operators that bound their subtree's output row count
_LOGICAL_BOUNDING = ("Aggregate", "GlobalLimit", "LocalLimit")


@dataclass
class _Node:
    depth: int
    text: str
    children: list["_Node"] = field(default_factory=list)


def _parse_logical(text: str) -> list[_Node]:
    """Flatten a logical-plan treeString into depth-annotated nodes in
    document order (child depth = parent depth + 1; each level is three
    characters of ``+- `` / ``:- `` / ``:  `` / three spaces)."""
    nodes = []
    for line in text.splitlines():
        if not line.strip():
            continue
        stripped = line.lstrip(" :+-")
        prefix_len = len(line) - len(stripped)
        nodes.append(_Node(prefix_len // 3, stripped))
    return nodes


def _subtree(nodes: list[_Node], i: int) -> list[_Node]:
    root = nodes[i]
    out = [root]
    for n in nodes[i + 1 :]:
        if n.depth <= root.depth:
            break
        out.append(n)
    return out


def _direct_children(nodes: list[_Node], i: int) -> list[int]:
    root = nodes[i]
    out = []
    for j in range(i + 1, len(nodes)):
        if nodes[j].depth <= root.depth:
            break
        if nodes[j].depth == root.depth + 1:
            out.append(j)
    return out


def broadcast_hint_violations(df: DataFrame) -> list[str]:
    """Violation strings for every broadcast *hint* whose hinted side is
    an unbounded corpus-table relation (empty list = clean)."""
    text = df._jdf.queryExecution().optimizedPlan().toString()
    nodes = _parse_logical(text)
    violations = []
    for i, n in enumerate(nodes):
        if not n.text.startswith("Join ") or "strategy=broadcast" not in n.text:
            continue
        kids = _direct_children(nodes, i)
        sides = []
        if "leftHint=(strategy=broadcast" in n.text and len(kids) >= 1:
            sides.append(("left", kids[0]))
        if "rightHint=(strategy=broadcast" in n.text and len(kids) >= 2:
            sides.append(("right", kids[1]))
        for side, k in sides:
            sub = _subtree(nodes, k)
            if any(s.text.split(" ", 1)[0] in _LOGICAL_BOUNDING for s in sub):
                continue  # aggregate/limit bounds the hinted side
            for s in sub:
                if not s.text.startswith("Relation"):
                    continue
                for table, sig in _TABLE_SIGNATURE.items():
                    if sig in s.text:
                        violations.append(
                            f"broadcast hint on {side} side over unbounded "
                            f"{table} relation"
                        )
    return violations


def all_pairs_joins(df: DataFrame) -> list[str]:
    """Node names of CartesianProduct / BroadcastNestedLoopJoin in the
    physical plan (empty list = clean)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = []
    for line in buf.getvalue().splitlines():
        if not line.strip():
            break  # end of the operator-tree section
        m = re.search(r"(CartesianProduct|BroadcastNestedLoopJoin)", line)
        if m:
            out.append(m.group(1))
    return out


def _walk_executed(jplan):
    """Depth-first walk of an EXECUTED physical plan via py4j, following
    AQE's final plan and descending into materialized query stages."""
    cls = jplan.getClass().getSimpleName()
    yield jplan, cls
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk_executed(jplan.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk_executed(jplan.plan())
    ch = jplan.children()
    for i in range(ch.size()):
        yield from _walk_executed(ch.apply(i))


def materialized_broadcast_bytes(df: DataFrame) -> list[tuple[int, int]]:
    """(dataSize bytes, numOutputRows) of every BroadcastExchange in the
    EXECUTED plan — the post-AQE runtime metric, i.e. the memory the
    hashed relation actually occupied, not the pre-AQE file-size
    estimate that decides the strategy.  Call AFTER an action; metrics
    are zero on an unexecuted plan.

    Caveat on small relations: dataSize includes the broadcast hash
    map's ALLOCATED pages, which floor at ~32 MiB on this build — a
    5-row dimension reports 32.0 MiB.  Budgets must therefore sit well
    above that floor (the 64 MiB default does); readings at exactly
    ~32 MiB with tiny numOutputRows are allocation, not data.

    This is the guard for the mid-scale window docs/SCALING.md measures:
    Spark's planning estimate for a pruned parquet projection is
    compressed-file-bytes x column fraction, which understates the
    materialized hashed relation ~4-8x, so a join can sit under the
    session's autoBroadcastJoinThreshold while its broadcast occupies
    hundreds of MiB of executor/driver memory.  The static hint guard
    above can't see that (nothing is hinted); only the executed metric
    can."""
    out = []
    for p, cls in _walk_executed(df._jdf.queryExecution().executedPlan()):
        if cls == "BroadcastExchangeExec":
            m = p.metrics()
            out.append((
                int(m.apply("dataSize").value()),
                int(m.apply("numOutputRows").value()),
            ))
    return out


def oversized_broadcasts(
    df: DataFrame, budget_bytes: int = 64 * 1024 * 1024
) -> list[str]:
    """Violation strings for every materialized broadcast whose runtime
    dataSize exceeds ``budget_bytes`` (empty list = clean).  Execute the
    DataFrame first.  The remedy is the committed mid-scale profile
    (``session.apply_mid_scale_profile``), which lowers the broadcast
    threshold so the understated estimates stop qualifying."""
    return [
        f"materialized broadcast {sz / 1048576:.1f} MiB "
        f"(rows={rows}) exceeds budget {budget_bytes / 1048576:.0f} MiB"
        for sz, rows in materialized_broadcast_bytes(df)
        if sz > budget_bytes
    ]
