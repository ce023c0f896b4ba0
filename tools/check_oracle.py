"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at a given scale factor, then compares row count, column names,
and (column-name-sorted, row-sorted) cell values.

Usage:  python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402
from iceberg_hybrid_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        # 12 significant digits: tolerate last-ulp noise that survives
        # in-query rounding, catch everything else.
        return (1, f"{v:.12g}")
    if isinstance(v, bool):
        return (2, str(int(v)))
    if isinstance(v, int):
        return (1, f"{float(v):.12g}") if abs(v) < 2**52 else (1, str(v))
    return (3, str(v))


def _table(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


# physical-width families: if the driver compares pandas dtypes, int32 vs
# int64 (Spark INT vs DuckDB BIGINT) would mismatch even when values agree
_SPARK_WIDTH = {
    "int": "i32", "bigint": "i64", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}
_DUCK_WIDTH = {
    "INTEGER": "i32", "BIGINT": "i64", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
    "BOOLEAN": "bool", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "DATE": "date",
}


def compare(name: str, spark_df, duck_rows, duck_cols, duck_types=None) -> list[str]:
    problems = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = [c.lower() for c in spark_df.columns]
    dcols = [c.lower() for c in duck_cols]
    if sorted(scols) != sorted(dcols):
        problems.append(f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if duck_types is not None:
        stypes = dict(zip(scols, [t for _, t in spark_df.dtypes]))
        for col, dt in zip(dcols, duck_types):
            sw = _SPARK_WIDTH.get(stypes.get(col, ""), stypes.get(col, ""))
            dw = _DUCK_WIDTH.get(dt, dt)
            if sw != dw and {sw, dw} & {"i8", "i16", "i32", "i64", "i128",
                                        "f32", "f64", "str", "bool", "ts", "date"}:
                problems.append(
                    f"type width mismatch on {col!r}: spark={stypes.get(col)} "
                    f"duck={dt}"
                )
    if len(srows) != len(duck_rows):
        problems.append(f"row count: spark={len(srows)} duck={len(duck_rows)}")
    _, st = _table(srows, scols)
    _, dt = _table([tuple(r) for r in duck_rows], dcols)
    if st != dt:
        n_bad = sum(1 for a, b in zip(st, dt) if a != b)
        problems.append(f"value mismatch in ~{n_bad} rows")
        for a, b in list(zip(st, dt))[:2000]:
            if a != b:
                problems.append(f"  spark={a}")
                problems.append(f"  duck ={b}")
                break
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = bad = rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  ~ {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                rows_only += 1
                continue
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_types = [str(t) for t in rel.types]
            duck_rows = rel.fetchall()
            problems = compare(name, df, duck_rows, duck_cols, duck_types)
        except Exception as e:
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:500]}"]
        dt = time.time() - t0
        if problems:
            bad += 1
            print(f"  ✗ {name} [{dt:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            ok += 1
            print(f"  ✓ {name} [{dt:.1f}s]")
    print(f"\n{ok} ok, {bad} bad, {rows_only} rows-only")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
