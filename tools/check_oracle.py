#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
runs Verify's oracle_sql.json in DuckDB against the same testdata parquet
and compares with the Spark-written result parquet (column-name-sorted,
row-sorted, value-compared). Not part of the engine."""
import sys, os, json, glob
import duckdb
import pandas as pd

# --strict mirrors the driver's exact gate: no dtype coercion, no float
# tolerance — a dtype difference (e.g. DuckDB HUGEINT -> pandas float64
# vs Spark int64) or any value repr difference is a FAIL, exactly like
# the driver's type-sensitive hash. Run strict before claiming a round.
strict = "--strict" in sys.argv
argv = [a for a in sys.argv if a != "--strict"]
# --only q1,q2 subsets the compare (targeted sweeps at bigger SFs, where
# running every oracle SQL in DuckDB is slow and spill-heavy);
# --json PATH additionally writes a per-query verdict record
only = None
json_out = None
positional = [argv[0]]
i = 1
while i < len(argv):
    a = argv[i]
    if a in ("--only", "--json"):
        if i + 1 >= len(argv):
            sys.exit(f"usage: check_oracle.py [SFDIR] [OUTDIR] [--strict] "
                     f"[--only q1,q2] [--json PATH]  ({a} needs a value)")
        if a == "--only":
            only = set(argv[i + 1].split(","))
        else:
            json_out = argv[i + 1]
        i += 2
    else:
        positional.append(a)
        i += 1
sfdir = positional[1] if len(positional) > 1 else "/root/testdata/sf0.001"
outdir = positional[2] if len(positional) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# spill to /tmp, not the repo cwd (a killed run once left 19 GB of
# duckdb_temp_storage files in ./.tmp)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
record = {}
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        oracle_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        record[name] = {"pass": False, "err": f"duckdb: {e}"}
        fail += 1
        continue
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        record[name] = {"pass": False, "err": "no spark output"}
        fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in spark_files])
    o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns differ: oracle={list(o.columns)} spark={list(s.columns)}")
        record[name] = {"pass": False, "err": "schema mismatch"}
        fail += 1
        continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows differ: oracle={len(o)} spark={len(s)}")
        record[name] = {"pass": False, "err": f"rows {len(s)} vs oracle {len(o)}"}
        fail += 1
        continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    diffs = []
    if strict:
        # driver-equivalent: dtype and exact value-repr must match
        for c in o.columns:
            if str(o[c].dtype) != str(s[c].dtype):
                diffs.append(f"col {c}: dtype oracle={o[c].dtype} spark={s[c].dtype}")
                continue
            eq = (o[c] == s[c]) | (o[c].isna() & s[c].isna())
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"col {c} row {bad}: oracle={o[c][bad]!r} spark={s[c][bad]!r}")
    else:
        # normalize dtypes for compare
        for c in o.columns:
            if o[c].dtype != s[c].dtype:
                try:
                    s[c] = s[c].astype(o[c].dtype)
                except Exception:
                    pass
        for c in o.columns:
            if o[c].dtype == "float64":
                eq = ((o[c] - s[c]).abs() < 1e-9) | (o[c].isna() & s[c].isna())
            else:
                eq = (o[c] == s[c]) | (o[c].isna() & s[c].isna())
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"col {c} row {bad}: oracle={o[c][bad]!r} spark={s[c][bad]!r}")
    if diffs:
        print(f"FAIL {name}: {('; '.join(diffs[:3]))}")
        record[name] = {"pass": False, "rows": len(o), "err": "; ".join(diffs[:3])}
        fail += 1
    else:
        print(f"PASS {name} ({len(o)} rows)")
        record[name] = {"pass": True, "rows": len(o), "err": None}
print(f"\n{len(oracle) - fail}/{len(oracle)} oracle queries pass")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sfdir, "strict": strict, "queries": record,
                   "n_pass": len(oracle) - fail, "n_total": len(oracle)}, f, indent=1)
    print(f"wrote {json_out}")
sys.exit(1 if fail else 0)
