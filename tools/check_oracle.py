#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity, mimicking the driver:
run graft.Verify output parquet vs each oracle SQL in DuckDB over the
same tables; compare row sets with columns sorted by name.

Usage: check_oracle.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <out>"` first)
"""
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no engine output dir")
            n_fail += 1
            continue
        try:
            tab = pq.read_table(pdir)
            eng_cols = list(tab.column_names)
            eng_rows = [tuple(r[c] for c in eng_cols) for r in tab.to_pylist()]
            cur = con.execute(sql)
            ora_cols = [d[0] for d in cur.description]
            ora_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ec, er = norm_rows(eng_cols, eng_rows)
        oc, orows = norm_rows(ora_cols, ora_rows)
        if ec != oc:
            print(f"FAIL {name}: column mismatch engine={ec} oracle={oc}")
            n_fail += 1
        elif er != orows:
            n_fail += 1
            print(f"FAIL {name}: {len(er)} vs {len(orows)} rows", end="")
            diffs = [i for i, (a, b) in enumerate(zip(er, orows)) if a != b]
            if len(er) != len(orows):
                eset, oset = set(er), set(orows)
                only_e = list(eset - oset)[:3]
                only_o = list(oset - eset)[:3]
                print(f"  engine-only={only_e}  oracle-only={only_o}")
            elif diffs:
                i = diffs[0]
                print(f"  first diff row {i}:\n    engine={er[i]}\n    oracle={orows[i]}"
                      f"  ({len(diffs)} rows differ)")
            else:
                print()
        else:
            n_pass += 1
            print(f"PASS {name} ({len(er)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
