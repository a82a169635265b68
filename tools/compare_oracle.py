#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query in
<outdir>/oracle_sql.json, run the SQL in DuckDB against the sf tables and compare with the
Spark parquet result (column names sorted, row multiset equality, schema types)."""
import sys, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); fail += 1; continue
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_types = {d[0]: str(d[1]) for d in got.description}
        got_rows = got.fetchall()
        try:
            want = con.execute(sql)
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
        want_cols = [d[0] for d in want.description]
        want_types = {d[0]: str(d[1]) for d in want.description}
        want_rows = want.fetchall()
        if sorted(got_cols) != sorted(want_cols):
            print(f"{name}: COLUMN MISMATCH spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            fail += 1; continue
        if got_types != want_types:
            print(f"{name}: TYPE MISMATCH spark={got_types} oracle={want_types}")
            fail += 1; continue
        g, w = canon_rows(got_rows, got_cols), canon_rows(want_rows, want_cols)
        if g != w:
            extra = [r for r in g if r not in set(w)][:3]
            missing = [r for r in w if r not in set(g)][:3]
            print(f"{name}: ROW MISMATCH spark={len(g)} oracle={len(w)} extra={extra} missing={missing}")
            fail += 1; continue
        print(f"{name}: OK rows={len(g)}")
        ok += 1
    print(f"== {ok} ok, {fail} fail (of {len(oracle)} oracled; rows-only queries not checked here)")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
