#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against the parquet tables in <sfDir>, and compares with the
Spark result parquet at <verifyOutDir>/<name>/. Compares row count, column
names (sorted), and values in result order. Order sensitivity is
intentional: every query declares a deterministic ORDER BY on both sides,
and Verify writes each result coalesce(1) so a single part file preserves
it.

The compare is EXACT, matching the driver's hash gate: both sides go
through pandas (so DuckDB HUGEINT/DECIMAL coerce to float64 exactly as the
driver's path does) and values compare by string repr. That means
int 78 != float 78.0, and 0.0 != -0.0 — deliberately. Round 7 shipped six
hash-red rows because a float-tolerant branch here masked exactly those
representation drifts; do not re-add tolerance.
"""
import sys, json, glob, math
import duckdb


def nullish(v):
    return v is None or (isinstance(v, float) and math.isnan(v))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = []
        s_cols, o_cols = sorted(spark.columns), sorted(ora.columns)
        if s_cols != o_cols:
            errs.append(f"cols spark={s_cols} oracle={o_cols}")
        elif len(spark) != len(ora):
            errs.append(f"rows spark={len(spark)} oracle={len(ora)}")
        else:
            spark = spark[s_cols].reset_index(drop=True)
            ora = ora[o_cols].reset_index(drop=True)
            for c in s_cols:
                sv, ov = list(spark[c]), list(ora[c])
                for i, (a, b) in enumerate(zip(sv, ov)):
                    if nullish(a) or nullish(b):
                        ok = nullish(a) and nullish(b)
                    else:
                        # exact, type-sensitive: "78" != "78.0", "0.0" != "-0.0"
                        ok = type(a).__name__ == type(b).__name__ and \
                             str(a) == str(b)
                    if not ok:
                        errs.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
                        break
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark)} rows, {len(s_cols)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
