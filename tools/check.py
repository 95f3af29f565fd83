#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over views of the
sfDir parquet tables, and compares: schema (column names), row count,
and values (columns sorted by name, rows sorted by all columns).

Exact equality for ints/strings; floats compared both bit-exact and at
1e-9 relative tolerance so we can see whether the decimal-exact trick
holds. This tool is for the builder's local loop only — the driver has
its own compare.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.map(lambda v: str(v)))
    return df


def cmp_vals(a, b):
    """-> (exact, close)"""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        close = a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return a == b, close
    eq = str(a) == str(b)
    return eq, eq


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # GenSf legs write Spark-style parquet DIRECTORIES; the
            # driver testdata ships flat files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"  ✗ {name}: SCHEMA got={gcols} exp={ecols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"  ✗ {name}: ROWS got={len(got)} exp={len(exp)}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        bad = []
        approx = 0
        for c in g.columns:
            for i, (x, y) in enumerate(zip(g[c].tolist(), e[c].tolist())):
                exact, close = cmp_vals(x, y)
                if not close:
                    bad.append((c, i, x, y))
                    if len(bad) > 3:
                        break
                elif not exact:
                    approx += 1
            if len(bad) > 3:
                break
        if bad:
            print(f"  ✗ {name}: VALUES {bad[:3]}")
            n_fail += 1
        else:
            note = f" ({approx} float-approx)" if approx else ""
            print(f"  ✓ {name}: {len(got)} rows{note}")
            n_pass += 1
    print(f"PASS {n_pass} / FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
