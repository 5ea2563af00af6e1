#!/usr/bin/env python3
"""Self-check: compare Verify's per-query parquet output against the DuckDB
oracle (same shape of check the driver runs). Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
  python3 scripts/selfcheck.py /tmp/graft_verify /root/testdata/sf0.01
Driver-side python only."""
import json
import sys

import duckdb


def norm(rows, cols):
    # sort columns by name (driver semantics), normalize value types
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and v.is_integer():
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    return out


def main(outdir, sfdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    ok = fail = 0
    import glob
    names = sorted(x.split('/')[-1] for x in glob.glob(f"{outdir}/*") if not x.endswith('.json'))
    for name in names:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(grows)} rows, cols={gcols}")
            continue
        exp = con.execute(oracle[name])
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            fail += 1
            continue
        g = norm(grows, gcols)
        e = norm(erows, ecols)
        if g == e:
            print(f"  OK {name}: {len(g)} rows")
            ok += 1
        else:
            fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            sg, se = set(g), set(e)
            for x in list(sg - se)[:3]:
                print(f"    spark-only: {x}")
            for x in list(se - sg)[:3]:
                print(f"    oracle-only: {x}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"    first diff at row {i}: {a} vs {b}")
                    break
    print(f"\n{ok} ok, {fail} fail, {len(names) - ok - fail} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
