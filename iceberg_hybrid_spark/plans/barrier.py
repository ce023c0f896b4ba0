"""Optimizer barriers — tiny plan-shaping utilities.

Catalyst's predicate pushdown is almost always right, but it pushes a
filter on an EXPENSIVE derived column through the projection that
defines it and into a join's residual condition.  There the expression
is evaluated per key-matched probe pair inside the hash-join loop —
outside whole-stage-codegen subexpression elimination and ahead of the
cheap residual guards — which measured 3x slower than evaluating it
once per joined row in the projection above (34 s vs 11 s for the
shingle-Jaccard threshold filter over a 26M-pair relation; see
near_dup_threshold_sweep).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stop_predicate_pushdown(col: Column) -> Column:
    """Wrap a column so filters referencing it are NOT pushed below the
    projection that computes it.

    Implementation: add a nondeterministic zero — ``col + 0.0 * rand()``.
    Catalyst may not reorder a filter past a nondeterministic projection,
    so the filter stays put; ``0.0 * rand()`` is exactly ``0.0`` for the
    finite rand range, so the VALUE is unchanged (a ``-0.0`` input would
    normalize to ``+0.0``, which ``round_stable`` does anyway).  The
    additive form is load-bearing: an always-true branch like
    ``when(rand() >= -1, col).otherwise(col)`` gets simplified away by
    SimplifyConditionals (identical branches) and the barrier silently
    vanishes, while ``0.0 * x`` survives because constant-folding may not
    assume ``0.0 * x == 0.0`` under IEEE (NaN/Inf).  Use only on
    expressions whose per-row cost dwarfs an add (array intersects,
    vector math), never on columns the scan could prune with."""
    return col + F.lit(0.0) * F.rand(7)
