#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify (Spark) at a
scale factor, then execute each oracle_sql.json entry in DuckDB over the same
parquet tables and compare values exactly (columns sorted by name, rows
compared after a stable sort). Dev tooling only — the shipped library has no
Python dependency.

Comparison goes THROUGH PANDAS on both sides, like the round driver's
checker, and rows are compared by their string rendering (repr), not Python
`==`: the driver hashes serialized values, so `2378545` (Spark BIGINT) and
`2378545.0` (DuckDB HUGEINT rendered by pandas as float64) must FAIL here
even though `==` would call them equal. This is exactly the class that let
q22_idle_customers ship green locally in r12 while the driver flagged it.
Additionally, any oracle whose RESULT schema contains an engine-divergent
widened type (DuckDB int128/HUGEINT, uint64) fails outright — no final
output column may carry a type widening the other engine can't produce
(SURVEY oracle-determinism doctrine)."""
import json, sys, glob, os
import math
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq

# DuckDB → pandas renderings that Spark can never emit: sum(BIGINT/INTEGER)
# widens to HUGEINT, which DuckDB's arrow export spells decimal128(38, 0)
# and pandas renders as float64; uint64/int128/decimal256 likewise.
FORBIDDEN_ARROW = ("int128", "uint64", "decimal256", "decimal128(38, 0)")


def norm(v):
    """Canonicalize one cell to a representation whose repr() matches the
    driver's serialization: numpy scalars → Python, arrays/lists → tuples,
    floats rounded to 9 dp with -0.0 folded to 0.0, temporals → isoformat."""
    if hasattr(v, "item") and not hasattr(v, "__len__"):  # numpy scalar
        v = v.item()
    if isinstance(v, Decimal):
        # DuckDB sums over DECIMAL literals (e.g. hash_embed's ±1.0) reach
        # pandas as Decimal objects; the driver renders them like floats
        # (hash_embed has been driver-green since r1). HUGEINT never gets
        # here — the decimal128(38, 0) schema check rejects it first.
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 9)
        return 0.0 if v == 0.0 else v
    if isinstance(v, (list, tuple)) or (hasattr(v, "__len__") and hasattr(v, "dtype")):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_of(df, order):
    """Sorted list of repr-rendered rows from a pandas frame (column order
    pre-sorted by name, so both engines serialize identically)."""
    cols = [df[c].tolist() for c in order]
    rows = [repr(tuple(norm(v) for v in r)) for r in zip(*cols)]
    return sorted(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
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
            duck_arrow = duck.arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        widened = [f.name for f in duck_arrow.schema
                   if any(tag in str(f.type) for tag in FORBIDDEN_ARROW)]
        if widened:
            print(f"FAIL {name}: oracle output column(s) {widened} carry a "
                  f"DuckDB-widened type (e.g. HUGEINT) — CAST them in the "
                  f"oracle SQL; the driver's pandas reader renders these "
                  f"as float64 and the hash diverges")
            n_fail += 1; continue
        scols = spark_tbl.column_names
        dcols = duck_arrow.column_names
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            n_fail += 1; continue
        order = sorted(scols)
        srows = rows_of(spark_tbl.to_pandas(), order)
        drows = rows_of(duck_arrow.to_pandas(), order)
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            n_fail += 1; continue
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows))
                       if a != b)
            print(f"FAIL {name}: value diff at sorted-row {bad} "
                  f"(cols {order}):")
            print(f"  spark: {srows[bad]}")
            print(f"  duck : {drows[bad]}")
            n_fail += 1; continue
        print(f"PASS {name}: {len(srows)} rows")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"))
