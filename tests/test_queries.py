"""Query-surface smoke at sf0.001: every registered query runs and returns
a stable schema.  (Full value correctness is the DuckDB oracle gate —
tools/check_oracle.py — run separately because it needs duckdb.)"""

import pytest

from iceberg_hybrid_spark.queries import all_specs

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
    # aliasing contract: no auto-generated aggregate names leak out
    for c in df.columns:
        assert "(" not in c, f"unaliased column {c!r} in {name}"


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())


def test_load_table_caches_per_session_and_sf(spark):
    from iceberg_hybrid_spark.sources.tables import load_table

    a = load_table(spark, SF_DIR, "orders")
    assert load_table(spark, SF_DIR, "orders") is a
    assert load_table(spark, "/root/testdata/sf0.01", "orders") is not a
    # the events ts column must come back as a timestamp regardless of the
    # file's physical type: TIMESTAMP(MICROS) arrives natively (NTZ or TZ
    # depending on isAdjustedToUTC), TIMESTAMP(NANOS) goes through the
    # nanosAsLong → timestamp_micros branch.  Either way no LongType leaks.
    ev = load_table(spark, SF_DIR, "events")
    assert load_table(spark, SF_DIR, "events") is ev
    assert str(ev.schema["ts"].dataType) in {"TimestampType()", "TimestampNTZType()"}


def test_queries_run_on_multi_file_table_dirs(spark, tmp_path):
    """A real lake table is a directory of many parquet files, not the
    single file the driver's testdata ships.  load_table takes either;
    results must be identical."""
    import os

    from iceberg_hybrid_spark.queries.llm import dedup_exact_documents
    from iceberg_hybrid_spark.sources.tables import load_table

    sf_dir = str(tmp_path / "sf_multi")
    os.makedirs(sf_dir)
    load_table(spark, SF_DIR, "documents").repartition(4).write.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    multi = {
        (r.fingerprint, r.canonical_id, r.dup_count)
        for r in dedup_exact_documents(spark, sf_dir).collect()
    }
    single = {
        (r.fingerprint, r.canonical_id, r.dup_count)
        for r in dedup_exact_documents(spark, SF_DIR).collect()
    }
    assert multi == single


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must be a registered query — a
    stale name would crash the driver's bench run and lose the round's
    only machine-readable perf artifact."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.HEADLINE if n not in SPECS]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dups


def test_readme_query_count_matches_registry():
    """README's stated query count is pinned to len(all_specs()) so it
    can't silently rot (it read '151' for two rounds after the registry
    hit 173)."""
    import re

    text = open("/root/repo/README.md").read()
    m = re.search(r"(\d+) named queries", text)
    assert m, "README no longer states the query count"
    assert int(m.group(1)) == len(all_specs())


def test_registry_order_is_static_and_deterministic():
    """The public registry order is a pure function of the code: the
    committed _PRIORITY prefix followed by declaration order — never
    runtime state, files on disk, or evaluation artifacts (locks in the
    round-4 removal of artifact-driven rotation)."""
    import __spark_entry__ as m

    first = list(m.queries())
    second = list(m.queries())
    assert first == second
    resolved_priority = [n for n in m._PRIORITY if n in set(first)]
    assert first[: len(resolved_priority)] == resolved_priority
    # every priority entry must resolve — a stale name would silently
    # shrink the checked window
    assert set(m._PRIORITY) <= set(first)


def test_event_type_drift_matches_reference_implementation(spark):
    """Pure-Python JS-divergence replication: same weekly bucketing,
    same 0*ln0 convention, same 0.5/0.5 split; JS in [0, ln 2]."""
    import math

    import pandas as pd

    from iceberg_hybrid_spark.queries.events import event_type_drift

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["wk"] = ev["ts"].dt.to_period("W").dt.start_time.dt.date
    weeks = sorted(ev["wk"].unique())
    dist = {
        wk: g["event_type"].value_counts(normalize=True).to_dict()
        for wk, g in ev.groupby("wk")
    }
    totals = ev.groupby("wk").size().to_dict()
    types = set(ev["event_type"])

    def js(p, q):
        s = 0.0
        for t in types:
            pc, pp = p.get(t, 0.0), q.get(t, 0.0)
            m = (pc + pp) / 2.0
            if pc > 0:
                s += 0.5 * pc * math.log(pc / m)
            if pp > 0:
                s += 0.5 * pp * math.log(pp / m)
        return s

    got = {r["wk"]: r for r in event_type_drift(spark, SF_DIR).collect()}
    assert sorted(got) == weeks[1:]
    for prev, cur in zip(weeks, weeks[1:]):
        row = got[cur]
        assert row["prev_wk"] == prev
        assert row["n_events"] == totals[cur]
        expect = js(dist[cur], dist[prev])
        assert abs(row["js_divergence"] - expect) < 1e-4
        assert 0.0 <= row["js_divergence"] <= math.log(2) + 1e-9


def test_events_hourly_gapfilled_is_dense_and_consistent(spark):
    """The scaffold yields a dense, duplicate-free hourly grid; gap
    rows are exactly the zero-count rows."""
    from datetime import timedelta

    from iceberg_hybrid_spark.queries.events import events_hourly_gapfilled

    rows = events_hourly_gapfilled(spark, SF_DIR).collect()
    hours = [r.hour_start for r in rows]
    assert len(set(hours)) == len(hours)
    for a, b in zip(hours, hours[1:]):
        assert b - a == timedelta(hours=1)
    for r in rows:
        assert (r.is_gap == 1) == (r.event_count == 0)
        if r.is_gap:
            assert r.total_value == 0.0


def test_hourly_anomaly_flags_matches_reference_implementation(spark):
    """Pure-Python median/MAD replication with the same interpolated
    median and the same |z| > 3 flag rule."""
    import pandas as pd

    from iceberg_hybrid_spark.queries.events import hourly_anomaly_flags

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cnt = ev.groupby(ev["ts"].dt.floor("h")).size().astype(float)
    med = cnt.quantile(0.5, interpolation="linear")
    ad = (cnt - med).abs()
    mad = ad.quantile(0.5, interpolation="linear")
    z = ((cnt - med) / (1.4826 * mad)).round(4)
    top = sorted(
        ((abs(v), ts, v) for ts, v in z.items()), key=lambda t: (-t[0], t[1])
    )[:10]

    rows = hourly_anomaly_flags(spark, SF_DIR).collect()
    assert len(rows) == 10
    for row, (_, ts, v) in zip(rows, top):
        assert row.hour_start == ts.to_pydatetime()
        assert abs(row.mad_z - v) < 1e-3
        assert row.is_anomaly == (1 if abs(v) > 3.0 else 0)


def test_hourly_anomaly_flags_survives_zero_mad(spark, tmp_path):
    """MAD is exactly 0 whenever >=50% of hours share the median count —
    e.g. a steady-rate stream.  Unguarded, ANSI mode raises
    DIVIDE_BY_ZERO on the whole query; the guard must instead yield
    mad_z = 0 for every hour (no robust score exists)."""
    import datetime
    import os

    from iceberg_hybrid_spark.queries.events import hourly_anomaly_flags

    sf_dir = str(tmp_path / "sf_steady")
    os.makedirs(sf_dir)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (h * 10 + i, base + datetime.timedelta(hours=h), 1, "view", 1.0, "{}")
        for h in range(24)
        for i in range(5)  # exactly 5 events EVERY hour -> MAD = 0
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))

    out = hourly_anomaly_flags(spark, sf_dir).collect()
    assert len(out) == 10
    assert all(r.mad_z == 0.0 and r.is_anomaly == 0 for r in out)


def test_daily_trend_slopes_matches_numpy_polyfit(spark):
    """OLS closed form agrees with numpy's least-squares fit and r²
    with the squared Pearson correlation."""
    import numpy as np
    import pandas as pd

    from iceberg_hybrid_spark.queries.events import daily_trend_slopes

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["d"] = ev["ts"].dt.floor("d")
    d0 = ev["d"].min()
    rows = daily_trend_slopes(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        g = ev[ev["event_type"] == r.event_type].groupby("d").size()
        x = np.array([(d - d0).days for d in g.index], dtype=float)
        y = g.values.astype(float)
        assert r.n_days == len(x)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope - slope) < 1e-3
        assert abs(r.intercept - intercept) < 1e-3
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(r.r2 - r2) < 1e-3
        assert 0.0 <= r.r2 <= 1.0


def test_view_to_purchase_latency_matches_reference_implementation(spark):
    """Pure-Python replication: first view per user, first purchase at
    or after it, interpolated percentiles over the latency seconds."""
    import pandas as pd

    from iceberg_hybrid_spark.queries.events import view_to_purchase_latency

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    views = (
        ev[ev["event_type"] == "view"].groupby("user_id")["ts"].min()
    )
    lat = []
    for uid, grp in ev[ev["event_type"] == "purchase"].groupby("user_id"):
        if uid not in views.index:
            continue
        fv = views[uid]
        after = grp[grp["ts"] >= fv]["ts"]
        if len(after):
            lat.append((after.min() - fv).total_seconds())
    s = pd.Series(lat)

    row = view_to_purchase_latency(spark, SF_DIR).collect()[0]
    assert row.converted_users == len(lat)
    for col, q in (("p50_s", 0.5), ("p90_s", 0.9), ("p99_s", 0.99)):
        assert abs(row[col] - s.quantile(q, interpolation="linear")) < 0.02


def test_part_affinity_rules_matches_reference_implementation(spark):
    """Pure-Python Apriori-style replication: same basket de-dup, same
    per-basket cap (smallest _BASKET_CAP parts), same min-support floor,
    same support/confidence/lift arithmetic."""
    import pandas as pd

    from iceberg_hybrid_spark.queries.advanced import (
        _BASKET_CAP,
        part_affinity_rules,
    )

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    baskets = op.groupby("l_orderkey")["l_partkey"].apply(
        lambda s: sorted(s)[:_BASKET_CAP]
    )
    n_b = len(baskets)
    part_n: dict[int, int] = {}
    for parts in baskets:
        for a in parts:
            part_n[a] = part_n.get(a, 0) + 1
    pair_c: dict[tuple[int, int], int] = {}
    for parts in baskets:
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair_c[(a, b)] = pair_c.get((a, b), 0) + 1
    scored = []
    for (a, b), c in pair_c.items():
        if c < 3:
            continue
        lift = round(c * n_b / (part_n[a] * part_n[b]) - 1e-9, 4) + 0.0
        scored.append((lift, a, b, c))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = scored[:20]

    got = part_affinity_rules(spark, SF_DIR).collect()
    assert len(got) == len(expect)
    for row, (lift, a, b, c) in zip(got, expect):
        assert (row.part_a, row.part_b) == (a, b)
        assert row.pair_orders == c
        assert row.orders_a == part_n[a] and row.orders_b == part_n[b]
        assert abs(row.lift - lift) < 1e-3
        assert abs(row.support - c / n_b) < 1e-5
        assert abs(row.confidence_a_to_b - c / part_n[a]) < 1e-3
        assert row.lift > 1.0  # above-chance by construction at this floor


def test_key_skew_profile_matches_reference_implementation(spark):
    """Pure-Python Gini/top-share/p99 replication over the same key
    columns, plus range sanity (0 <= gini < 1)."""
    import math

    import pandas as pd

    from iceberg_hybrid_spark.queries.advanced import key_skew_profile

    def profile(series):
        counts = sorted(series.value_counts().tolist())
        n = len(counts)
        tot = sum(counts)
        s_rank = sum(i * x for i, x in enumerate(counts, start=1))
        gini = round(2 * s_rank / (n * tot) - (n + 1) / n - 1e-9, 4) + 0.0
        p99 = counts[math.ceil(n * 0.99) - 1]
        return n, tot, max(counts), p99, gini

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    expect = {
        "events.user_id": profile(ev["user_id"]),
        "lineitem.l_orderkey": profile(li["l_orderkey"]),
        "lineitem.l_partkey": profile(li["l_partkey"]),
        "documents.lang": profile(docs["lang"]),
    }
    got = {r.key_name: r for r in key_skew_profile(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for name, (n, tot, mx, p99, gini) in expect.items():
        r = got[name]
        assert (r.n_keys, r.n_rows, r.max_count) == (n, tot, mx)
        assert r.p99_count == p99
        assert abs(r.gini - gini) < 1e-3
        assert 0.0 <= r.gini < 1.0
        assert abs(r.top1_share - mx / tot) < 1e-5


def test_rfm_customer_segments_matches_reference_implementation(spark):
    """Pure-Python RFM replication: same type-1 quartile thresholds,
    same 1-4 scoring, same segment grid; segment sizes sum to the
    customer count and each quartile class holds ~25% of customers."""
    import math

    import pandas as pd

    from iceberg_hybrid_spark.queries.advanced import rfm_customer_segments

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    d0 = orders["o_orderdate"].max().normalize()
    g = orders.groupby("o_custkey")
    cust = pd.DataFrame({
        "r": (d0 - g["o_orderdate"].max().dt.normalize()).dt.days,
        "f": g.size(),
        "m_raw": g["o_totalprice"].sum(),
    })
    cust["m_bin"] = (cust["m_raw"] // 1000).astype(int)

    def thresholds(vals):
        v = sorted(vals)
        n = len(v)
        return [v[math.ceil(q * n) - 1] for q in (0.25, 0.5, 0.75)]

    rt, ft, mt = (
        thresholds(cust["r"]), thresholds(cust["f"]),
        thresholds(cust["m_bin"]),
    )
    seg: dict[tuple[int, int, int], list] = {}
    for _, row in cust.iterrows():
        rs = 4 - sum(row["r"] > t for t in rt)
        fs = 1 + sum(row["f"] > t for t in ft)
        ms = 1 + sum(row["m_bin"] > t for t in mt)
        seg.setdefault((rs, fs, ms), []).append(row["m_raw"])

    got = {
        (r.r_score, r.f_score, r.m_score): r
        for r in rfm_customer_segments(spark, SF_DIR).collect()
    }
    assert set(got) == set(seg)
    for key, monies in seg.items():
        row = got[key]
        assert row.customers == len(monies)
        assert abs(row.avg_monetary - sum(monies) / len(monies)) < 0.05
    assert sum(r.customers for r in got.values()) == len(cust)


def test_range_write_plan_under_heavy_key_skew(spark, tmp_path):
    """Type-1 range planning with a dominant key: all equal keys land in
    exactly ONE partition (a range write can't split a key), counts sum
    to n, partitions are contiguous in key space, and the skew is
    VISIBLE in the audit rather than smoothed away — the planner's job
    is to report it, the operator's job is then salting/bucketing."""
    import datetime
    import os

    from iceberg_hybrid_spark.queries.lake_ops import range_write_plan

    sf_dir = str(tmp_path / "sf_skew")
    os.makedirs(sf_dir)
    hot = datetime.datetime(2024, 6, 1)
    # l_orderkey = 1 keeps every row clear of the query's derived
    # NULL-injection rule (1 % 101 != 0); the 7 rows with key 101 hit it
    # and must land in the dedicated null partition, excluded from the
    # boundary planning entirely
    rows = [(hot, 1)] * 100 + [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), 1)
        for i in range(60)
    ] + [(hot, 101)] * 7
    spark.createDataFrame(rows, "l_shipdate timestamp, l_orderkey long") \
        .coalesce(1) \
        .write.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    out = range_write_plan(spark, sf_dir).collect()
    assert sum(r.n_rows for r in out) == 167
    nulls = [r for r in out if r.partition_id == -1]
    assert len(nulls) == 1
    assert nulls[0].n_rows == 7
    assert nulls[0].min_key is None and nulls[0].max_key is None
    out = [r for r in out if r.partition_id >= 0]
    assert sum(r.n_rows for r in out) == 160
    # contiguous, non-overlapping key ranges in partition order
    for a, b in zip(out, out[1:]):
        assert a.max_key <= b.min_key
    # the hot key sits in exactly one partition, which therefore carries
    # at least its 100 rows (share >= 100/167) — reported, not hidden
    hot_parts = [r for r in out if r.min_key <= hot <= r.max_key]
    assert len(hot_parts) == 1
    assert hot_parts[0].n_rows >= 100
    assert hot_parts[0].share_pct >= 59.8


def test_fk_integrity_audit_null_and_orphan_semantics(spark, tmp_path):
    """SQL MATCH SIMPLE: a NULL FK satisfies the constraint and must be
    reported as null_fk_rows, never as an orphan; a non-NULL key with no
    parent is an orphan.  Doctored orders table: one NULL o_custkey, one
    dangling o_custkey."""
    import os

    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.queries.advanced import fk_integrity_audit

    sf_dir = str(tmp_path / "sf_fk")
    os.makedirs(sf_dir)
    for t in ("region", "nation", "customer", "supplier", "part", "lineitem",
              "orders", "events", "documents", "embeddings"):
        src = f"{SF_DIR}/{t}.parquet"
        if t == "orders":
            orders = spark.read.parquet(src)
            keys = [r.o_orderkey for r in orders.select("o_orderkey")
                    .orderBy("o_orderkey").limit(2).collect()]
            doctored = orders.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") == keys[0], F.lit(None))
                .when(F.col("o_orderkey") == keys[1], F.lit(999_999_999))
                .otherwise(F.col("o_custkey")),
            )
            doctored.coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
        else:
            os.symlink(src, f"{sf_dir}/{t}.parquet")

    rows = {r.fk_edge: r for r in fk_integrity_audit(spark, sf_dir).collect()}
    oc = rows["orders->customer"]
    assert oc.null_fk_rows == 1
    assert oc.orphan_rows == 1
    # the clean edges stay clean
    assert rows["customer->nation"].orphan_rows == 0
    assert rows["customer->nation"].null_fk_rows == 0
    assert rows["lineitem->orders"].orphan_rows == 0
