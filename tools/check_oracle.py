# Local pre-validation of SparkEntry.oracleSql vs Verify output.
# Mimics the driver's correctness gate: run Verify at a given SF, execute
# each oracle SQL in DuckDB over the same parquet tables, sort columns by
# name + rows by all columns, and compare values exactly.
#
# Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
import sys, os, json, math
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out

fails = []
for name, sql in sorted(oracles.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no Verify output)")
        fails.append(name)
        continue
    try:
        s = con.sql(f"select * from read_parquet('{spark_dir}/*.parquet')")
        scols, srows = s.columns, s.fetchall()
        d = con.sql(sql)
        dcols, drows = d.columns, d.fetchall()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails.append(name)
        continue
    if sorted(scols) != sorted(dcols):
        print(f"SCHEMA   {name}: spark={sorted(scols)} duck={sorted(dcols)}")
        fails.append(name)
        continue
    cs, cd = canon(srows, scols), canon(drows, dcols)
    if len(cs) != len(cd):
        print(f"ROWS     {name}: spark={len(cs)} duck={len(cd)}")
        fails.append(name)
        continue
    if cs != cd:
        bad = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
        print(f"VALUES   {name}: {len(bad)}/{len(cs)} rows differ; first: ")
        i = bad[0]
        print(f"  spark: {cs[i]}")
        print(f"  duck : {cd[i]}")
        fails.append(name)
        continue
    print(f"OK       {name} ({len(cs)} rows)")

print(f"\n{len(oracles) - len(fails)}/{len(oracles)} oracle queries match")
sys.exit(1 if fails else 0)
