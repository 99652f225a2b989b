#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare values. Never imported by library code (driver-side python only).

Usage: python3 tools/check_oracle.py <sfdir> <outdir>
(run `sbt -batch "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pq.read_table(files[0]) if files else None
        if name not in oracles:
            n = got.num_rows if got is not None else -1
            print(f"{name:35s} rows-only: {n} rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"{name:35s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        # driver-style compare: sort columns by name, then compare values
        gcols = sorted(got.column_names)
        ecols = sorted(exp.column_names)
        if gcols != ecols:
            print(f"{name:35s} SCHEMA MISMATCH spark={gcols} duck={ecols}")
            failures += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"{name:35s} ROWS {got.num_rows} != {exp.num_rows}")
            failures += 1
            continue
        gd = {c: got.column(c).to_pylist() for c in gcols}
        ed = {c: exp.column(c).to_pylist() for c in ecols}
        bad = []
        for c in gcols:
            for i, (a, b) in enumerate(zip(gd[c], ed[c])):
                if isinstance(a, float) and isinstance(b, float):
                    ok = (a == b) or (abs(a - b) < 1e-12)
                else:
                    ok = str(a) == str(b)
                if not ok:
                    bad.append((c, i, a, b))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"{name:35s} VALUE MISMATCH {bad[:3]}")
            failures += 1
        else:
            print(f"{name:35s} OK ({got.num_rows} rows)")
    print(f"\n{'FAILURES: %d' % failures if failures else 'ALL ORACLE CHECKS PASSED'}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
