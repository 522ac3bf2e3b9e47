#!/usr/bin/env python3
"""Local t2 mirror: run each oracle_sql.json query in DuckDB over the fixture
tables (registered as bare-name views) and compare with the Spark parquet
output written by graft.Verify. Mirrors the driver: sort columns by name,
then compare row-for-row.

Usage: python3 tools/check.py [--sort-rows] <sfDir> <outDir> [key ...]

--sort-rows: compare as sorted multisets instead of row-for-row — for
outputs written WITHOUT coalesce(1) (SPARK_GRAFT_VERIFY_COALESCE=0), where
multi-file parquet loses the ORDER BY. Sorting both sides by ALL columns
is a total order over full rows, so the comparison stays exact.
"""
import json, os, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    argv = list(sys.argv[1:])
    sort_rows = "--sort-rows" in argv
    if sort_rows:
        argv.remove("--sort-rows")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    # default 4 mirrors the driver; scale sweeps override (heavy sf10
    # oracles — brute-force ANN ground truth — parallelize well)
    con.execute("SET threads=%d" % int(os.environ.get("GRAFT_DUCKDB_THREADS", "4")))
    if os.environ.get("GRAFT_DUCKDB_MEMLIMIT"):
        con.execute("SET memory_limit='%s'" % os.environ["GRAFT_DUCKDB_MEMLIMIT"])
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracles.items()):
        if only and key not in only:
            continue
        # Giant outputs (tens of millions of rows — the diagnostic quadratics
        # at sf10+) cannot round-trip through pandas (measured 74 GB RSS →
        # OOM). Above the threshold, compare entirely inside DuckDB: equal
        # column sets + equal row counts + empty symmetric EXCEPT ALL is
        # exactly the sorted-multiset compare, and DuckDB spills to disk.
        duck_threshold = int(os.environ.get("GRAFT_DUCK_COMPARE_ROWS", "5000000"))
        try:
            n_spark = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{key}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {key}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if sort_rows and n_spark > duck_threshold:
            try:
                ecols = sorted(r[0] for r in con.sql(
                    f"DESCRIBE (WITH __e AS ({sql}) SELECT * FROM __e)").fetchall())
                gcols = sorted(r[0] for r in con.sql(
                    f"DESCRIBE (SELECT * FROM '{out_dir}/{key}/*.parquet')").fetchall())
                if ecols != gcols:
                    print(f"FAIL {key}: columns differ: oracle={ecols} spark={gcols}")
                    n_fail += 1
                    continue
                cols = ", ".join(f'"{c}"' for c in ecols)
                n_exp = con.sql(f"WITH __e AS ({sql}) SELECT count(*) FROM __e").fetchone()[0]
                if n_exp != n_spark:
                    print(f"FAIL {key}: rows differ: oracle={n_exp} spark={n_spark}")
                    n_fail += 1
                    continue
                diff = con.sql(f"""
                    WITH e AS ({sql}),
                         g AS (SELECT * FROM '{out_dir}/{key}/*.parquet')
                    SELECT count(*) FROM (
                      (SELECT {cols} FROM e EXCEPT ALL SELECT {cols} FROM g)
                      UNION ALL
                      (SELECT {cols} FROM g EXCEPT ALL SELECT {cols} FROM e))
                    """).fetchone()[0]
                if diff:
                    print(f"FAIL {key}: {diff} rows differ (duck multiset compare)")
                    n_fail += 1
                else:
                    print(f"PASS {key} ({n_spark} rows, duck multiset compare)")
                    n_pass += 1
            except Exception as e:
                print(f"FAIL {key}: duck compare error: {e}")
                n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {key}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{key}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {key}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if sort_rows and len(exp.columns) > 0:
            sk = [exp[c].astype(str) for c in exp.columns]
            exp = exp.iloc[sorted(range(len(exp)), key=lambda i: tuple(k[i] for k in sk))].reset_index(drop=True)
            sk = [got[c].astype(str) for c in got.columns]
            got = got.iloc[sorted(range(len(got)), key=lambda i: tuple(k[i] for k in sk))].reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {key}: columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {key}: rows differ: oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(exp.columns):
            ev, gv = exp[c].tolist(), got[c].tolist()
            for ri in range(len(ev)):
                a, b = ev[ri], gv[ri]
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if a != b:
                        bad = (ri, c, a, b); break
                elif str(a) != str(b):
                    bad = (ri, c, a, b); break
            if bad:
                break
        if bad:
            ri, c, a, b = bad
            print(f"FAIL {key}: row {ri} col {c}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
