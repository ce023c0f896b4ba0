"""Query registry: every implemented operator exposed as a named query.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with an ANSI-SQL
oracle string (DuckDB-runnable) computing the same result.  Specs with
``oracle=None`` are non-SQL-expressible (streaming/stateful/LSH) and get a
rows-only check from the driver.

Determinism contract (both sides must follow it):
- every computed/aggregate column is aliased identically,
- floating-point aggregates are rounded (2dp money, 4-6dp ratios) so the
  hash compare is robust to summation-order differences,
- every top-k/limit query orders by the *rounded* measure plus a unique
  key, so the cutoff is engine-independent.
"""

from __future__ import annotations

from .spec import QuerySpec, all_specs

__all__ = ["QuerySpec", "all_specs"]
