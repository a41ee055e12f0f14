#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 bench/check_oracle.py <sfDir> <verifyOutDir> [query,query,...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and runs the
matching oracle_sql.json entry in DuckDB over the sfDir tables, then compares
row count, column names (sorted), and a row-set hash over stringified values
with columns sorted by name — mirroring the driver's canonicalization.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(fmt(r[i]) for i in order))
    return sorted(out)

def fmt(v):
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        srel = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        try:
            orel = con.execute(sql)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = ok_rows and ok_cols and canon(srows, scols) == canon(orows, ocols)
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{name}: {status} spark_rows={len(srows)} oracle_rows={len(orows)}"
              f" cols_match={ok_cols} hash_match={ok_hash}")
        if status == "FAIL" and ok_rows and ok_cols:
            a, b = canon(srows, scols), canon(orows, ocols)
            diff = [x for x in a if x not in b][:3]
            print(f"  spark-only sample: {diff}")
            diff = [x for x in b if x not in a][:3]
            print(f"  oracle-only sample: {diff}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
