#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only;
not part of the Scala library). Runs after `sbt "runMain graft.Verify
<sfDir> <outDir>"`: loads each query's parquet dump and its oracle SQL,
executes the SQL in DuckDB over the same testdata, and diffs at the
DRIVER's strictness: pandas-level dtypes and exact values.

Boundary-type contract (mirrors the driver's comparator, which sorts
columns by name and hashes pandas values):
  * scalar columns only — a cell that is a list/ndarray/dict/set
    crashes or defeats the driver's hash → FAIL here;
  * no raw DECIMAL on the boundary — Spark parquet decimals land in
    pandas as `object` (decimal.Decimal) while DuckDB's land as
    float64; equal values, different dtypes → driver hash red → FAIL
    here.  Cast sums/decimals to DOUBLE or BIGINT on BOTH sides;
  * pandas dtype KINDS must match column-for-column (int64 vs float64
    is a driver red even when every value is equal; int32 vs int64 is
    NOT — the r14-green emb_gram_matrix/sql_grouping_sets rows pin the
    driver as width-insensitive, kind-sensitive);
  * float values compare rounded to 6 places (the r14-green
    stream_hopping_volume row differs in the last ulp across the two
    engines' round() implementations and still passed the driver);
    everything else compares exactly (NaN==NaN allowed; datetimes
    normalized to a common unit first).

Round-14 post-mortem: the old value-rounding comparator passed three
rows the driver redded (array cell, raw decimal, int-vs-float sum).
This version fails all three pre-fix forms and passes the fixed ones.
"""
import sys, json, os, math, decimal, datetime
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

NONSCALAR = (np.ndarray, list, dict, set, tuple)


def boundary_violations(df, side):
    """Columns violating the scalar-only / no-Decimal boundary contract."""
    errs = []
    for c in df.columns:
        if df[c].dtype == object:
            for v in df[c]:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue
                if isinstance(v, NONSCALAR):
                    errs.append(f"{side}.{c}: non-scalar cell {type(v).__name__}")
                    break
                if isinstance(v, decimal.Decimal):
                    errs.append(f"{side}.{c}: raw DECIMAL on the boundary "
                                "(cast to DOUBLE/BIGINT on both sides)")
                    break
    return errs


def normalize(df):
    """Unit-normalize datetimes so [ns] vs [us] parquet metadata doesn't
    read as a dtype mismatch (both engines' values are micros)."""
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    return df


def cell_key(v):
    if v is None:
        return (1, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        # sort at the SAME precision values compare at — a last-ulp
        # cross-engine difference must not reorder rows and misalign
        # the pairwise zip
        return (0, f"{round(v, 6):.6f}")
    return (0, str(v))


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return round(a, 6) == round(b, 6)
    # pandas NaT / None cross-representation of SQL NULL
    if (a is None or a is pd.NaT or (isinstance(a, float) and math.isnan(a))) and \
       (b is None or b is pd.NaT or (isinstance(b, float) and math.isnan(b))):
        return True
    return a == b


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = 0
    for name in names:
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = pd.read_parquet(qdir)
            sdf.columns = [c.lower() for c in sdf.columns]
            ddf = con.sql(oracle[name]).df()
            ddf.columns = [c.lower() for c in ddf.columns]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        sdf = normalize(sdf[sorted(sdf.columns)])
        ddf = normalize(ddf[sorted(ddf.columns)])
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: cols {list(sdf.columns)} vs {list(ddf.columns)}")
            n_fail += 1; continue
        errs = boundary_violations(sdf, "spark") + boundary_violations(ddf, "duckdb")
        if errs:
            print(f"FAIL {name}: boundary contract: {errs}"); n_fail += 1; continue
        # kind-strict, width-insensitive ('i'/'u' merged: signedness is a
        # width concern, not a kind concern, at the hash)
        def kind(dt):
            return "i" if dt.kind in "iu" else dt.kind
        dt_bad = [(c, str(sdf[c].dtype), str(ddf[c].dtype))
                  for c in sdf.columns if kind(sdf[c].dtype) != kind(ddf[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype-kind mismatch (driver hash red): {dt_bad}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(ddf)}"); n_fail += 1; continue
        srows = sorted([tuple(r) for r in sdf.itertuples(index=False)],
                       key=lambda t: tuple(cell_key(x) for x in t))
        drows = sorted([tuple(r) for r in ddf.itertuples(index=False)],
                       key=lambda t: tuple(cell_key(x) for x in t))
        bad = [(a, b) for a, b in zip(srows, drows)
               if not all(cells_equal(x, y) for x, y in zip(a, b))][:3]
        if bad:
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
