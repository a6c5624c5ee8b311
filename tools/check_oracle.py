#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only;
not part of the Scala library). Runs after `sbt "runMain graft.Verify
<sfDir> <outDir>"`: loads each query's parquet dump and its oracle SQL,
executes the SQL in DuckDB over the same testdata, and diffs rows/schema.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(oracle[name])
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        sidx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        didx = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
            n_fail += 1; continue
        s = canon([tuple(r[i] for i in sidx) for r in spark_rows])
        d = canon([tuple(r[i] for i in didx) for r in duck_rows])
        if len(s) != len(d):
            print(f"FAIL {name}: rowcount {len(s)} vs {len(d)}"); n_fail += 1; continue
        if s != d:
            bad = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
