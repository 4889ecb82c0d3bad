#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query in
outDir/oracle_sql.json, run the SQL over the sf parquet tables and compare
against outDir/<name>/ parquet (row count, sorted-column schema, value hash
over rows sorted by all columns). Usage:
    python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, hashlib
import duckdb

def canon(rows, cols):
    # sort columns by name; normalize values to strings; sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(v):
        if v is None: return "NULL"
        if isinstance(v, float): return repr(v)
        return str(v)
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in data:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(data)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            wcols = [c.lower() for c in want.columns]
            wrows = want.fetchall()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            gcols = [c.lower() for c in got.columns]
            grows = got.fetchall()
            wh, wn = canon(wrows, wcols)
            gh, gn = canon(grows, gcols)
            schema_ok = sorted(wcols) == sorted(gcols)
            status = "OK" if (wh == gh and schema_ok) else "MISMATCH"
            if status == "OK": ok += 1
            else:
                bad += 1
                print(f"[{status}] {name}: rows spark={gn} duck={wn} "
                      f"schema_ok={schema_ok} cols spark={sorted(gcols)} duck={sorted(wcols)}")
                if wn and gn and schema_ok:
                    sw = set(tuple(map(str, r)) for r in wrows)
                    sg = set(tuple(map(str, r)) for r in grows)
                    only_w = list(sw - sg)[:3]; only_g = list(sg - sw)[:3]
                    print(f"   only-duck: {only_w}\n   only-spark: {only_g}")
                continue
            print(f"[OK] {name}: {gn} rows")
        except Exception as e:
            bad += 1
            print(f"[ERROR] {name}: {e}")
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
