#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>

Registers the sf parquet tables as DuckDB views, runs each oracle SQL from
oracle_sql.json, and diffs against the Verify parquet dump: schema (sorted
column names + types) and exact multiset row equality (EXCEPT ALL both ways).
"""
import duckdb, sys, json, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(d[:-8] if d.endswith(".parquet") else d
                   for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = 0
    for name in names:
        d = (f"{out_dir}/{name}.parquet"
             if os.path.isdir(f"{out_dir}/{name}.parquet") else f"{out_dir}/{name}")
        path = f"{d}/*.parquet"
        try:
            got = con.sql(f"SELECT * FROM '{path}'")
            gcols = sorted(zip(got.columns, [str(t) for t in got.types]))
            if name not in oracle:
                print(f"[rows-only] {name}: rows={len(got.fetchall())} cols={gcols}")
                continue
            exp = con.sql(oracle[name])
            ecols = sorted(zip(exp.columns, [str(t) for t in exp.types]))
            if [c for c, _ in gcols] != [c for c, _ in ecols]:
                print(f"[FAIL-cols] {name}: got={gcols} exp={ecols}")
                n_bad += 1
                continue
            if gcols != ecols:
                print(f"[WARN-types] {name}:")
                for g, e in zip(gcols, ecols):
                    if g != e:
                        print(f"    {g[0]}: got {g[1]} exp {e[1]}")
            sel_g = ", ".join(f'"{c}"' for c, _ in gcols)
            con.sql(f"CREATE OR REPLACE VIEW _got AS SELECT {sel_g} FROM '{path}'")
            con.sql(f"CREATE OR REPLACE TEMP VIEW _exp_raw AS {oracle[name]}")
            con.sql(f"CREATE OR REPLACE VIEW _exp AS SELECT {sel_g} FROM _exp_raw")
            ng = con.sql("SELECT count(*) FROM _got").fetchone()[0]
            ne = con.sql("SELECT count(*) FROM _exp").fetchone()[0]
            d1 = con.sql("SELECT count(*) FROM (SELECT * FROM _got EXCEPT ALL SELECT * FROM _exp)").fetchone()[0]
            d2 = con.sql("SELECT count(*) FROM (SELECT * FROM _exp EXCEPT ALL SELECT * FROM _got)").fetchone()[0]
            if ng == ne and d1 == 0 and d2 == 0:
                print(f"[ok] {name}: rows={ng}")
                n_ok += 1
            else:
                print(f"[FAIL-rows] {name}: got={ng} exp={ne} onlyGot={d1} onlyExp={d2}")
                ex = con.sql("SELECT * FROM _got EXCEPT ALL SELECT * FROM _exp LIMIT 3").fetchall()
                ex2 = con.sql("SELECT * FROM _exp EXCEPT ALL SELECT * FROM _got LIMIT 3").fetchall()
                print(f"    onlyGot sample: {ex}\n    onlyExp sample: {ex2}")
                n_bad += 1
        except Exception as e:
            print(f"[ERROR] {name}: {e}")
            n_bad += 1
    # oracle_sql.json carries each key under both "name" and "name.parquet"
    # (driver keys by file name); normalize before the missing-output check
    missing = {k[:-8] if k.endswith(".parquet") else k for k in oracle} - set(names)
    if missing:
        print(f"[MISSING verify output] {sorted(missing)}")
    print(f"== {n_ok} ok, {n_bad} bad, {len(names) - n_ok - n_bad} rows-only ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
