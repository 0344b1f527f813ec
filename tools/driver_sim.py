"""Local simulation of the driver's correctness gate.

Runs each __spark_entry__ query on Spark and its oracle on DuckDB at
sf0.01, then compares row count + sorted-column-name value multisets.
Usage: python tools/driver_sim.py [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    import duckdb

    import __spark_entry__ as entry
    from dbimport_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    failures = []
    for name in wanted:
        fn = qs[name]
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = norm_rows(s_cols, s_rows) == norm_rows(d_cols, d_rows)
        status = "OK  " if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(s_rows)}/{len(d_rows)} cols_ok={ok_cols} vals_ok={ok_vals}"
        )
        if status == "FAIL" and ok_cols and ok_count:
            a = norm_rows(s_cols, s_rows)
            b = norm_rows(d_cols, d_rows)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"      spark={x}\n      duck ={y}")
        elif status == "FAIL" and not ok_cols:
            print(f"      spark cols={sorted(s_cols)}\n      duck  cols={sorted(d_cols)}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
