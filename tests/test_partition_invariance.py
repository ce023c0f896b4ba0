"""Results must not depend on the physical partitioning.

Floating-point aggregation order changes with the shuffle partition
count (partial aggs combine in a different order), so any query whose
output depends on raw float-sum order would produce different bytes on
a 1000-executor cluster than on local[4] — and drift between rounds as
AQE re-plans.  ``round_stable`` (functions/text.py) exists to absorb
exactly this; these tests pin that it actually does, by running
float-agg-heavy queries under different shuffle partition counts in a
separate Spark session and comparing collected results exactly.
"""

import pytest

from iceberg_hybrid_spark.queries import all_specs

SF_DIR = "/root/testdata/sf0.01"

# float-aggregation-heavy queries across families: TPC-H avgs, health
# score weighted sums, unigram logprob sums, dup-fraction avgs, quality
# avgs — the outputs most exposed to partial-agg combine order.
QUERIES = [
    "q1_pricing_summary",
    "nation_health_score",
    "unigram_logprob_quality",
    "span_duplication_report",
    "source_curation_report",
    "doc_token_stats",
    "embedding_norm_stats",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def spark7(spark):
    """A sibling session sharing the JVM but with its own SQL conf —
    shuffle partitions 7 vs the test fixture's 4 (and AQE re-coalesces
    differently), forcing a different partial-agg combine order."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    return s


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partition_count(spark, spark7, name):
    spec = all_specs()[name]
    assert _rows(spec.fn(spark, SF_DIR)) == _rows(spec.fn(spark7, SF_DIR))
