#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [json_out]

With a third argument, additionally writes machine-readable results
(per-query pass/fail + reason, totals) to that path — committed per
round as CORRECTNESS_local_r<N>.json so a driver-side artifact hiccup
never leaves a round without correctness evidence (r16 verdict #1:
the driver's CORRECTNESS_r16.json landed empty).

Reads each <name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, canonicalizes both (columns sorted by name, rows sorted), and
compares cell-by-cell (exact).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def main(outdir, sfdir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (DataGen sf1 layout)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    for name, sql in sorted(oracle.items()):
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"pass": False, "reason": "no spark output"}
            n_fail += 1; continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.sql(sql).df())
            # Dtype-strict gate (the driver's hash is dtype-sensitive:
            # an uncast DuckDB SUM widens to HUGEINT where Spark emits
            # BIGINT and fails the driver despite equal values — r10
            # lost 5 queries to exactly this). Describe BOTH sides
            # through DuckDB so the type vocabulary is uniform.
            gt = {r[0]: r[1] for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})"
            ).fetchall()}
            wt = {r[0]: r[1] for r in con.sql(
                f"DESCRIBE {sql}").fetchall()}
            dbad = [(c, gt.get(c), wt.get(c)) for c in sorted(gt)
                    if gt.get(c) != wt.get(c)]
            if dbad:
                print(f"FAIL {name}: dtype mismatch "
                      + "; ".join(f"{c}: spark={a} duck={b}"
                                  for c, a, b in dbad))
                results[name] = {"pass": False, "reason": "dtype: " +
                    "; ".join(f"{c}: spark={a} duck={b}"
                              for c, a, b in dbad)}
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: {e}")
            results[name] = {"pass": False, "reason": str(e)[:300]}
            n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            results[name] = {"pass": False, "reason":
                f"cols {list(got.columns)} vs {list(want.columns)}"}
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            results[name] = {"pass": False,
                "reason": f"rows {len(got)} vs {len(want)}"}
            n_fail += 1; continue
        import numpy as np
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            if np.issubdtype(a.dtype, np.number) and np.issubdtype(b.dtype, np.number):
                same = (a.astype("float64").fillna(np.inf)
                        == b.astype("float64").fillna(np.inf))
            else:
                same = a.astype(str) == b.astype(str)
            if not same.all():
                ok = False
                break
        if not ok:
            neq = (got.astype(str) != want.astype(str)).any(axis=1)
            if not neq.any():
                neq = ~same
            print(f"FAIL {name}: {neq.sum()} differing rows; first:")
            idx = neq.idxmax()
            print("  spark:", got.loc[idx].to_dict())
            print("  duck :", want.loc[idx].to_dict())
            results[name] = {"pass": False,
                "reason": f"{neq.sum()} differing rows"}
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)")
        results[name] = {"pass": True, "rows": len(got)}
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        import datetime
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sfdir, "n_pass": n_pass,
                       "n_fail": n_fail,
                       "utc": datetime.datetime.utcnow()
                           .strftime("%Y-%m-%dT%H:%M:%SZ"),
                       "queries": results}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
