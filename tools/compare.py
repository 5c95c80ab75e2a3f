#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify (Spark) at a
scale factor, then execute each oracle_sql.json entry in DuckDB over the same
parquet tables and compare values exactly (columns sorted by name, rows
compared after a stable sort). Dev tooling only — the shipped library has no
Python dependency."""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, 'isoformat'):
        return v.isoformat()
    if isinstance(v, int):
        return float(v) if False else v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_tbl = pq.read_table(files[0])
        except Exception as e:
            print(f"FAIL {name}: read error {e}"); n_fail += 1; continue
        try:
            duck = con.sql(sql)
            dcols = duck.columns
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        scols = spark_tbl.column_names
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}"); n_fail += 1; continue
        order = sorted(scols)
        sdata = spark_tbl.to_pydict()
        srows = list(zip(*[sdata[c] for c in order]))
        didx = [dcols.index(c) for c in order]
        drows2 = [tuple(r[i] for i in didx) for r in drows]
        srows_n = sorted([tuple(norm(v) for v in r) for r in srows], key=repr)
        drows_n = sorted([tuple(norm(v) for v in r) for r in drows2], key=repr)
        if len(srows_n) != len(drows_n):
            print(f"FAIL {name}: rows {len(srows_n)} vs {len(drows_n)}"); n_fail += 1; continue
        if srows_n != drows_n:
            bad = next(i for i,(a,b) in enumerate(zip(srows_n, drows_n)) if a != b)
            print(f"FAIL {name}: value diff at sorted-row {bad} (cols {order}):")
            print(f"  spark: {srows_n[bad]}")
            print(f"  duck : {drows_n[bad]}")
            n_fail += 1; continue
        print(f"PASS {name}: {len(srows_n)} rows")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv)>1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv)>2 else "/tmp/verify_out"))
