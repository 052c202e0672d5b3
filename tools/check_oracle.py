#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB over the sf parquet tables and compare to the Spark parquet
output (columns sorted by name, rows sorted, values compared)."""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        rel = con.execute(sql)
        # Driver-parity guard: DuckDB sum() over BIGINT yields HUGEINT
        # (int128), which pandas silently coerces to float/object — the
        # value check below then passes while the driver's type-sensitive
        # hash fails (round-4 ctn1/ds1/ds3/pack1). Flag it as a hard FAIL.
        huge = [d[0] for d in rel.description
                if "HUGEINT" in str(d[1]).upper() or "INT128" in str(d[1]).upper()]
        if huge:
            print(f"FAIL {name}: HUGEINT oracle columns {huge} — add CAST(... AS BIGINT)")
            fails += 1
            continue
        odf = rel.fetchdf()
        sdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns {scols} vs oracle {ocols}")
            fails += 1
            continue
        o = odf[ocols].values.tolist()
        s = sdf[ocols].values.tolist()
        def norm(rows):
            out = []
            for r in rows:
                rr = []
                for v in r:
                    if isinstance(v, float):
                        rr.append(round(v, 6))
                    elif hasattr(v, "isoformat"):
                        rr.append(v.isoformat())
                    else:
                        rr.append(v)
                out.append(tuple(rr))
            return sorted(out, key=repr)
        o, s = norm(o), norm(s)
        if len(o) != len(s):
            print(f"FAIL {name}: {len(s)} rows vs oracle {len(o)}")
            fails += 1
        elif o != s:
            diff = [(a, b) for a, b in zip(o, s) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            fails += 1
        else:
            print(f"ok   {name}: {len(s)} rows")
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle checks pass")
sys.exit(1 if fails else 0)
