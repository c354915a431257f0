#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate (NOT part of the
engine): runs each SparkEntry query's dumped parquet against the DuckDB
oracle SQL and compares values with columns sorted by name.

Usage:  sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify'
        python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return str(v)

def rowkey(row):
    return tuple((v is None, str(v)) for v in row)

def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows = frame(con, sql)
            gcols, grows = frame(
                con, f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {e}")
            continue
        if ocols != gcols:
            failed.append(name)
            print(f"FAIL {name}: columns oracle={ocols} got={gcols}")
        elif len(orows) != len(grows):
            failed.append(name)
            print(f"FAIL {name}: rows oracle={len(orows)} got={len(grows)}")
        elif sorted(orows, key=rowkey) != sorted(grows, key=rowkey):
            failed.append(name)
            diff = [(a, b) for a, b in zip(sorted(orows, key=rowkey),
                                           sorted(grows, key=rowkey)) if a != b]
            print(f"FAIL {name}: {len(diff)} mismatched rows; first: {diff[:2]}")
        else:
            print(f"ok   {name} ({len(grows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
