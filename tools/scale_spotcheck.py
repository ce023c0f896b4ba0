"""Scaling spot-check harness — 1x vs Nx corpus wall-clock per operator.

Generates a salted Nx replication of the sf0.1 documents/embeddings
fixtures (see docs/SCALING.md "Methodology" — salting keeps cross-replica
near-dup pair volume realistic instead of turning every document into an
N-way duplicate group), then times a chosen set of registered queries on
the 1x and Nx corpora in the same session.  Evidence generator for the
100-TB posture claims in docs/SCALING.md / docs/PLANS.md.

Usage:
  python tools/scale_spotcheck.py [query ...]          # default set, 16x
  SPOT_REPLICAS=8 python tools/scale_spotcheck.py ...  # other N

Timings are machine-dependent — this is a measurement tool, not a test.
Output: one JSON line per query {name, x1, xN, ratio}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
import pandas as _pd  # noqa: E402
from pyspark.sql import functions as _F  # noqa: E402
from pyspark.sql.functions import pandas_udf as _pudf  # noqa: E402

from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/scale_spot"

DEFAULT_QUERIES = (
    "dedup_exact_documents",
    "minhash_near_dup",
    "near_dup_clusters",
    "simhash_near_dup",
    "cdc_chunk_overlap",
    "near_dup_shingle_pairs",
    "embedding_near_dup_pairs",
    "embedding_lsh_ann",
    "span_duplication_report",
    "source_overlap_matrix",
)


def build_corpus(spark, replicas: int) -> str:
    """Nx corpus dir: salted documents, noise-perturbed embeddings, and
    symlinks for the other tables so any registered query can run.

    The x1 corpus is built through this SAME builder (replicas=1 is a
    byte-identical rewrite of the fixture): both scales get the same
    32-file layout, so with one-partition-per-file scan configs (set in
    ``main``) both saturate the 32-thread box and the x16/x1 wall-clock
    ratio tracks WORK growth.  Measuring against the raw single-file
    fixture instead conflates scaling with map-stage parallelism — the
    round-4 numbers did exactly that (x16 as 8 files bin-packed into 3
    scan partitions ran 10/32 starved while x1 ran 1/32 starved)."""
    out = os.path.join(WORK, f"x{replicas}")
    done = os.path.join(out, ".done_v3")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(replicas).withColumnRenamed("id", "replica")
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("replica") * n_docs).alias("doc_id"),
            # replica 0 untouched; every TOKEN of the other replicas gets
            # a per-replica suffix.  A salt merely APPENDED to the text
            # leaves cross-replica Jaccard at ~0.96 — every document
            # becomes a 16-way near-dup group and the pair-producing
            # operators measure duplicate-density pathology (ratios of
            # 15-30x observed) instead of data-volume scaling.  Per-token
            # salting zeroes cross-replica shingle overlap while
            # preserving each replica's INTERNAL duplicate structure, so
            # true-pair volume grows ~Nx like a real Nx corpus.
            F.when(F.col("replica") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit("_r"), F.col("replica")),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()
    (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("replica") * n_emb).alias("vec_id"),
            "label",
            # deterministic per-(vec_id, replica, dim) pseudo-noise ±0.05
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: F.when(F.col("replica") == 0, x).otherwise(
                    x
                    + (
                        F.pmod(F.xxhash64(F.col("vec_id"), F.col("replica"), i), F.lit(1000))
                        .cast("double")
                        / 10000.0
                        - 0.05
                    )
                ),
            ).alias("embedding"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    # Fact tables the events/analytics and TPC-H-shaped operators scan:
    # replicate with CONSISTENT key strides (same orderkey stride in
    # orders and lineitem, same custkey stride in customer and orders)
    # so joins stay semantically intact — each replica is a disjoint
    # population of users/customers/orders over the same calendar and
    # the same part/supplier/nation catalog (the realistic growth axis:
    # more traffic, not a longer calendar).  Dims stay symlinked.
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    strides = ev.agg(
        (F.max("event_id") + 1).alias("se"), (F.max("user_id") + 1).alias("su")
    ).collect()[0]
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("replica") * strides.se).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("replica") * strides.su).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    cust = spark.read.parquet(f"{BASE}/customer.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    so = orders.agg(F.max("o_orderkey") + 1).collect()[0][0]
    sc_ = cust.agg(F.max("c_custkey") + 1).collect()[0][0]
    (
        orders.crossJoin(F.broadcast(reps))
        .select(
            (F.col("o_orderkey") + F.col("replica") * so).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("replica") * sc_).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    (
        cust.crossJoin(F.broadcast(reps))
        .select(
            (F.col("c_custkey") + F.col("replica") * sc_).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    (
        li.crossJoin(F.broadcast(reps))
        .select(
            (F.col("l_orderkey") + F.col("replica") * so).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )

    for name in ("region", "nation", "supplier", "part"):
        link = f"{out}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{BASE}/{name}.parquet", link)
    open(done, "w").close()
    return out


# --- lake-format scale scenarios -------------------------------------------
# The registry's lake-ops queries drive their lifecycles from TINY dims
# (nation/region), so running them against the replicated corpus would
# measure nothing.  These scenarios drive the same HyTable code paths
# (manifest commit, MOR delete apply-on-read, changelog diff, bucketed
# exchange-free join) from the REPLICATED documents corpus, so the
# table-format overheads get honest 1x-vs-Nx evidence.  Invoke by name:
#   python tools/scale_spotcheck.py lake_mor_lifecycle lake_changelog ...

def _fresh(tag: str) -> str:
    import shutil
    root = os.path.join(WORK, "lake", tag)
    shutil.rmtree(root, ignore_errors=True)
    return root


def lake_mor_lifecycle(spark, sf_dir):
    """create (manifest write) → equality-delete file → MOR upsert →
    delete-applying read.  Measures commit + apply-on-read cost vs
    corpus size; the delete hits ~10% of rows."""
    from iceberg_hybrid_spark.lake.table import HyTable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    n = docs.count()
    t = HyTable(spark, _fresh(f"mor_{os.path.basename(sf_dir)}"))
    t.create(docs)
    t.delete_where_mor([("doc_id", "<", n // 10)], ["doc_id"])
    t.upsert_mor(
        spark.createDataFrame(
            [(int(n // 2), "xx", "UPSERTED_ROW")], "doc_id bigint, lang string, text string"
        ),
        ["doc_id"],
    )
    return t.read().groupBy("lang").count().orderBy("lang")


def lake_changelog(spark, sf_dir):
    """create half → append half → delete 5% → row-level changelog
    across the three snapshots (insert + delete rows)."""
    from iceberg_hybrid_spark.lake.table import HyTable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    n = docs.count()
    t = HyTable(spark, _fresh(f"cl_{os.path.basename(sf_dir)}"))
    t.create(docs.filter(F.col("doc_id") < n // 2))
    t.append(docs.filter(F.col("doc_id") >= n // 2))
    t.delete_where([("doc_id", "<", n // 20)])
    return t.changelog(1, 3).groupBy("_change_type").count().orderBy("_change_type")


def lake_bucketed_join(spark, sf_dir):
    """bucketBy(8) write of two narrow projections + the exchange-free
    sort-merge self-join on doc_id (the write.distribution-mode=hash
    payoff) — measures whether the bucketed path stays shuffle-free and
    scan-bound as the fact side grows."""
    import hashlib
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    sides = {}
    for side, cols in (("a", ("doc_id", "lang")), ("b", ("doc_id", "n_chars"))):
        name = f"ihs_spot_bkt_{side}_{tag}"
        path = os.path.join(tempfile.gettempdir(), "ihs_spot_bkt", f"{side}_{tag}")
        if not spark.catalog.tableExists(name):
            (
                docs.select(*cols)
                .write.mode("overwrite")
                .option("path", path)
                .bucketBy(8, "doc_id")
                .sortBy("doc_id")
                .saveAsTable(name)
            )
        sides[side] = spark.table(name)
    return (
        sides["a"].join(sides["b"], "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .orderBy("lang")
    )


LAKE_SCENARIOS = {
    "lake_mor_lifecycle": lake_mor_lifecycle,
    "lake_changelog": lake_changelog,
    "lake_bucketed_join": lake_bucketed_join,
}

# Streaming-ingest queries maintain persisted state tables at known
# scratch paths (queries/lake_ops.py::_scratch) — report their final row
# counts alongside wall-clock, because BOUNDED STATE GROWTH is the claim
# the 100 TB ingestion story rests on (fps grows with distinct texts,
# bands with docs x bands, HLL registers stay <= langs x 1024 at any
# corpus size).
STREAM_STATE = {
    "streaming_dedup_ingest": ("streamdedup", "fps"),
    "streaming_neardup_ingest": ("streamneardup", "bands"),
    "streaming_hll_ingest": ("streamhll", "registers"),
    "streaming_cms_ingest": ("streamcms", "cells"),
}


def _state_rows(spark, name: str) -> int | None:
    import tempfile

    from iceberg_hybrid_spark.lake.table import HyTable

    tag, sub = STREAM_STATE[name]
    path = os.path.join(tempfile.gettempdir(), "ihs_lake_ops", tag, sub)
    return HyTable(spark, path).read().count()


def main() -> None:
    replicas = int(os.environ.get("SPOT_REPLICAS", "16"))
    names = sys.argv[1:] or list(DEFAULT_QUERIES)
    spark = get_spark("scale-spotcheck")
    spark.sparkContext.setLogLevel("ERROR")
    # one scan partition per corpus file: without this the 32-file
    # corpora bin-pack into ~2-3 scan partitions (openCostInBytes
    # dominates for small files) and the map-side fold stages run
    # 3/32-starved — timings then measure parallelism, not work
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "4m")
    base_dir = build_corpus(spark, 1)
    big_dir = build_corpus(spark, replicas)
    specs = all_specs()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    # warm the Arrow/python-worker pool too: the first pandas_udf call in
    # a session pays worker fork + Arrow init (~4-6 s), which otherwise
    # lands on whichever embedding query runs first and reads as a bogus
    # per-operator regression
    @_pudf("long")
    def _warm(s: _pd.Series) -> _pd.Series:
        return s
    spark.range(1000).select(_warm(_F.col("id"))).collect()

    for name in names:
        fn = LAKE_SCENARIOS.get(name) or specs[name].fn
        times = {}
        state = {}
        for label, sf_dir in (("x1", base_dir), (f"x{replicas}", big_dir)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[label] = round(best, 2)
            if name in STREAM_STATE:
                state[f"state_rows_{label}"] = _state_rows(spark, name)
        ratio = round(times[f"x{replicas}"] / times["x1"], 1) if times["x1"] else None
        print(json.dumps({"query": name, **times, "ratio": ratio, **state}), flush=True)


if __name__ == "__main__":
    main()
