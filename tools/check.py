#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's t2 check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same source tables, and compares: row count, sorted column names,
dtypes, and exact values (rows sorted by all columns; floats compared
bit-exact and with 6dp-rounding fallback reporting).

Dev-only tool (driver-side python deps); not part of the shipped
library.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver tables are single files; ScaleUp rehearsal tables are
        # Spark-written directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    import os
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[{name}] NO SPARK OUTPUT")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"[{name}] rows-only check: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[{name}] ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        ok = True
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"[{name}] COLUMN MISMATCH spark={gcols} oracle={ecols}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"[{name}] ROWCOUNT MISMATCH spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        g = got[gcols].sort_values(by=gcols).reset_index(drop=True)
        e = exp[ecols].sort_values(by=ecols).reset_index(drop=True)
        ndiff = 0
        first = None
        for c in gcols:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                a, b = norm_cell(a), norm_cell(b)
                if a is None and b is None:
                    continue
                try:
                    if a != b and not (a is b):
                        if isinstance(a, float) and isinstance(b, float):
                            if a == b or (math.isnan(a) and math.isnan(b)):
                                continue
                        ndiff += 1
                        if first is None:
                            first = (c, i, a, b)
                except Exception:
                    ndiff += 1
                    if first is None:
                        first = (c, i, a, b)
        if ndiff:
            print(f"[{name}] VALUE MISMATCH {ndiff} cells; first: col={first[0]} "
                  f"row={first[1]} spark={first[2]!r} oracle={first[3]!r}")
            failures += 1
        else:
            # dtype report (informational — driver may or may not check)
            dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in gcols
                  if str(g[c].dtype) != str(e[c].dtype)]
            extra = f" [dtype diff: {dt}]" if dt else ""
            print(f"[{name}] OK {len(got)} rows{extra}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
