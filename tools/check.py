#!/usr/bin/env python3
"""Local t2 mirror: run each oracle_sql.json query in DuckDB over the fixture
tables (registered as bare-name views) and compare with the Spark parquet
output written by graft.Verify. Mirrors the driver: sort columns by name,
then compare row-for-row.

Usage: python3 tools/check.py [--sort-rows] [--json PATH] <sfDir> <outDir> [key ...]

--sort-rows: compare as sorted multisets instead of row-for-row — for
outputs written WITHOUT coalesce(1) (SPARK_GRAFT_VERIFY_COALESCE=0), where
multi-file parquet loses the ORDER BY. Sorting both sides by ALL columns
is a total order over full rows, so the comparison stays exact.
--json PATH: also write a parseable per-key artifact
{key: {"match": bool, "rows": N|null, "detail": str}} plus a "__summary__"
tally — the committed attestation format for scale sweeps
(CORRECTNESS_sf10.json etc.).

Giant-output tier (> GRAFT_DUCK_DIGEST_ROWS, --sort-rows only): constant-
memory digest compare using TWO INDEPENDENT hash families — (a) DuckDB's
native multi-arg hash() over the column tuple (sum + xor, row-association-
preserving, no delimiter serialization) and (b) per-column md5_number_lower
sums + non-null counts (different bytes entirely) — so a blind spot in one
function cannot silently pass both sides.
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
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("usage: check.py [--sort-rows] [--json PATH] <sfDir> <outDir> [key ...]"
                     " — --json requires a PATH value")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit("usage: check.py [--sort-rows] [--json PATH] <sfDir> <outDir> [key ...]")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    results = {}
    con = duckdb.connect()
    # default 4 mirrors the driver; scale sweeps override (heavy sf10
    # oracles — brute-force ANN ground truth — parallelize well)
    con.execute("SET threads=%d" % int(os.environ.get("GRAFT_DUCKDB_THREADS", "4")))
    if os.environ.get("GRAFT_DUCKDB_MEMLIMIT"):
        con.execute("SET memory_limit='%s'" % os.environ["GRAFT_DUCKDB_MEMLIMIT"])
    # in-memory DuckDB has operator spilling DISABLED unless a temp dir is
    # set — without this, a memory_limit turns big-oracle sweeps into hard
    # OOM errors instead of spills (hit by txt_rake_keywords at sf100)
    if os.environ.get("GRAFT_DUCKDB_TMPDIR"):
        con.execute("SET temp_directory='%s'" % os.environ["GRAFT_DUCKDB_TMPDIR"])
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0

    def ok(key, rows, detail):
        nonlocal n_pass
        n_pass += 1
        results[key] = {"match": True, "rows": int(rows), "detail": detail}
        print(f"PASS {key} ({rows} rows{', ' + detail if detail else ''})")
        # incremental checkpoint: a multi-hour scale sweep killed mid-run
        # still leaves a parseable partial attestation (in_progress: true)
        if json_path:
            write_json(json_path, results, n_pass, n_fail, sf_dir, sort_rows,
                       in_progress=True)

    def fail(key, detail, rows=None):
        nonlocal n_fail
        n_fail += 1
        results[key] = {"match": False,
                        "rows": None if rows is None else int(rows),
                        "detail": detail}
        print(f"FAIL {key}: {detail}")
        # Some errors (observed: an IO Error probing a missing output at the
        # sf100 sweep) leave the implicit transaction ABORTED, and every
        # later query then fails with "Current transaction is aborted" — one
        # bad key must not poison the rest of the sweep.
        try:
            con.execute("ROLLBACK")
        except Exception:
            pass
        if json_path:
            write_json(json_path, results, n_pass, n_fail, sf_dir, sort_rows,
                       in_progress=True)

    for key, sql in sorted(oracles.items()):
        if only and key not in only:
            continue
        # Giant outputs (tens of millions of rows — the diagnostic quadratics
        # at sf10+) cannot round-trip through pandas (measured 74 GB RSS →
        # OOM). Above the threshold, compare entirely inside DuckDB: equal
        # column sets + equal row counts + empty symmetric EXCEPT ALL is
        # exactly the sorted-multiset compare, and DuckDB spills to disk.
        # The count probe exists only for the duck-compare threshold branch,
        # which requires --sort-rows; in row-for-row mode skip it so a
        # missing output is still attributed at the `got` read (after the
        # oracle ran), matching the driver's error ordering.
        duck_threshold = int(os.environ.get("GRAFT_DUCK_COMPARE_ROWS", "5000000"))
        if sort_rows:
            try:
                n_spark = con.sql(
                    f"SELECT count(*) FROM '{out_dir}/{key}/*.parquet'").fetchone()[0]
            except Exception as e:
                fail(key, f"spark output missing/unreadable: {e}")
                continue
        # Beyond ~half a billion rows even the DuckDB-side EXCEPT ALL cannot
        # materialize both sides (sim_simhash_bands emitted 1.8 B rows at
        # sf10 pre-r14-cap — two hash joins over that spilled past 140 GB).
        # Digest compare, all commutative and streamed through constant-size
        # aggregates on BOTH sides, built from TWO INDEPENDENT hash families
        # so a single-function blind spot cannot pass both:
        #   (a) row digests from DuckDB's native hash() applied to the column
        #       TUPLE directly (multi-arg hash — no delimiter serialization,
        #       so '|'-containing values cannot alias across columns):
        #       SUM(hash(c1..cn)) exact in HUGEINT + bit_xor(hash(c1..cn));
        #   (b) per-column digests over DIFFERENT bytes: non-null count plus
        #       SUM(md5_number_lower(CAST(c AS VARCHAR))) per column — md5
        #       shares no structure with DuckDB's internal hash. Per-column
        #       sums alone would miss cross-column row swaps; (a) pins row
        #       association, (b) pins the byte content independently.
        # Multiset equality up to a simultaneous collision in BOTH families,
        # with zero materialization.
        digest_threshold = int(os.environ.get("GRAFT_DUCK_DIGEST_ROWS", "500000000"))
        if sort_rows and n_spark > digest_threshold:
            try:
                ecols = sorted(r[0] for r in con.sql(
                    f"DESCRIBE (WITH __e AS ({sql}) SELECT * FROM __e)").fetchall())
                gcols = sorted(r[0] for r in con.sql(
                    f"DESCRIBE (SELECT * FROM '{out_dir}/{key}/*.parquet')").fetchall())
                if ecols != gcols:
                    fail(key, f"columns differ: oracle={ecols} spark={gcols}")
                    continue
                tup = ", ".join(f'"{c}"' for c in ecols)
                percol = ", ".join(
                    f'count("{c}"), SUM(CAST(md5_number_lower(CAST("{c}" AS VARCHAR)) AS HUGEINT))'
                    for c in ecols)
                def dig(src):
                    return con.sql(
                        f"SELECT count(*), SUM(CAST(hash({tup}) AS HUGEINT)), "
                        f"bit_xor(hash({tup})), {percol} FROM {src}").fetchone()
                de = dig(f"({sql}) __e")
                dg = dig(f"(SELECT * FROM '{out_dir}/{key}/*.parquet') __g")
                if de != dg:
                    fail(key, f"digest differs: oracle={de} spark={dg}", rows=n_spark)
                else:
                    ok(key, n_spark,
                       "digest compare: count + sum/xor of tuple-hash + per-column md5 sums")
            except Exception as e:
                fail(key, f"digest compare error: {e}")
            continue
        if sort_rows and n_spark > duck_threshold:
            try:
                ecols = sorted(r[0] for r in con.sql(
                    f"DESCRIBE (WITH __e AS ({sql}) SELECT * FROM __e)").fetchall())
                gcols = sorted(r[0] for r in con.sql(
                    f"DESCRIBE (SELECT * FROM '{out_dir}/{key}/*.parquet')").fetchall())
                if ecols != gcols:
                    fail(key, f"columns differ: oracle={ecols} spark={gcols}")
                    continue
                cols = ", ".join(f'"{c}"' for c in ecols)
                # One query, oracle evaluated ONCE (AS MATERIALIZED — DuckDB
                # re-inlines multiply-referenced CTEs otherwise): an empty
                # symmetric EXCEPT ALL is multiset equality, which subsumes
                # the count check — no separate count(*) over the oracle.
                diff = con.sql(f"""
                    WITH e AS MATERIALIZED ({sql}),
                         g AS MATERIALIZED (SELECT * FROM '{out_dir}/{key}/*.parquet')
                    SELECT count(*) FROM (
                      (SELECT {cols} FROM e EXCEPT ALL SELECT {cols} FROM g)
                      UNION ALL
                      (SELECT {cols} FROM g EXCEPT ALL SELECT {cols} FROM e))
                    """).fetchone()[0]
                if diff:
                    fail(key, f"{diff} rows differ (duck multiset compare)", rows=n_spark)
                else:
                    ok(key, n_spark, "duck multiset compare")
            except Exception as e:
                fail(key, f"duck compare error: {e}")
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            fail(key, f"oracle error: {e}")
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{key}/*.parquet'").df()
        except Exception as e:
            fail(key, f"spark output missing/unreadable: {e}")
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if sort_rows and len(exp.columns) > 0:
            sk = [exp[c].astype(str) for c in exp.columns]
            exp = exp.iloc[sorted(range(len(exp)), key=lambda i: tuple(k[i] for k in sk))].reset_index(drop=True)
            sk = [got[c].astype(str) for c in got.columns]
            got = got.iloc[sorted(range(len(got)), key=lambda i: tuple(k[i] for k in sk))].reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            fail(key, f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            continue
        if len(exp) != len(got):
            fail(key, f"rows differ: oracle={len(exp)} spark={len(got)}")
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
            fail(key, f"row {ri} col {c}: oracle={a!r} spark={b!r}", rows=len(exp))
        else:
            ok(key, len(exp), "")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_path:
        write_json(json_path, results, n_pass, n_fail, sf_dir, sort_rows,
                   in_progress=False)
    sys.exit(1 if n_fail else 0)


def write_json(json_path, results, n_pass, n_fail, sf_dir, sort_rows,
               in_progress):
    out = dict(results)
    out["__summary__"] = {
        "n_pass": n_pass, "n_fail": n_fail,
        "n_keys": n_pass + n_fail, "sf_dir": sf_dir,
        "mode": "sorted-multiset" if sort_rows else "row-for-row"}
    if in_progress:
        out["__summary__"]["in_progress"] = True
    tmp = json_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    os.replace(tmp, json_path)

if __name__ == "__main__":
    main()
