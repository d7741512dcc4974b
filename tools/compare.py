#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the same parquet tables and compare with the Spark results
dumped by graft.Verify (row count, schema-less sorted-column value hash)."""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, bool): v = str(v).lower()
            elif isinstance(v, float): v = f"{v:.9g}"
            elif v is None: v = "NULL"
            else: v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    out.sort()
    return out

fails = 0
for name in sorted(glob.glob(f"{outdir}/*/")):
    q = os.path.basename(name.rstrip("/"))
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{name}/*.parquet')")
    scols = [d[0] for d in spark_rel.description]
    srows = spark_rel.fetchall()
    if q not in oracle:
        print(f"  {q:24s} rows={len(srows):6d}  (rows-only, no oracle)")
        continue
    try:
        orel = con.sql(oracle[q])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
    except Exception as e:
        print(f"✗ {q:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(srows, scols), canon(orows, ocols)
    if sorted(scols) != sorted(ocols):
        print(f"✗ {q:24s} SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}")
        fails += 1
    elif a == b:
        print(f"✓ {q:24s} rows={len(a)}")
    else:
        print(f"✗ {q:24s} VALUES differ: spark {len(a)} rows vs oracle {len(b)}")
        sa, sb = set(a), set(b)
        for x in list(sa - sb)[:3]: print(f"    spark-only:  {x[:140]}")
        for x in list(sb - sa)[:3]: print(f"    oracle-only: {x[:140]}")
        fails += 1
# A query that crashed on the Spark side writes no output dir and would
# otherwise silently vanish from the gate: fail for every oracle-listed
# query with no dump.
seen = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{outdir}/*/")}
for q in sorted(set(oracle) - seen):
    print(f"✗ {q:24s} NO SPARK OUTPUT (query crashed in Verify?)")
    fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
