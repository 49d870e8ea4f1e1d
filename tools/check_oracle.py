#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"`,
run `python3 tools/check_oracle.py target/verify_out /root/testdata/sf0.01`.

For each <name>/ parquet dir in outDir: run oracle_sql.json[name] in DuckDB
against views over the sf parquet tables, sort columns by name, compare
row counts, schemas and values.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            status = []
            if list(got.columns) != list(want.columns):
                status.append(f"cols spark={list(got.columns)} oracle={list(want.columns)}")
            elif list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
                diff = [(c, str(a), str(b)) for c, a, b in
                        zip(got.columns, got.dtypes, want.dtypes) if str(a) != str(b)]
                status.append(f"dtypes differ: {diff}")
            if len(got) != len(want):
                status.append(f"rows spark={len(got)} oracle={len(want)}")
            if not status:
                g = [tuple(norm(v) for v in row) for row in got.itertuples(index=False)]
                w = [tuple(norm(v) for v in row) for row in want.itertuples(index=False)]
                if sorted(g) != sorted(w):
                    diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
                    status.append(f"values differ e.g. {diff}")
                elif g != w:
                    status.append("ORDER differs (values match unordered)")
            if status:
                n_fail += 1
                print(f"FAIL {name}: {'; '.join(status)}")
            else:
                n_pass += 1
                print(f"ok   {name} ({len(got)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
