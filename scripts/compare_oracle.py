#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle SQL over the same parquet tables and
value-compare (rows / schema / exact symmetric diff on name-sorted columns).

Usage: python3 scripts/compare_oracle.py /tmp/vout /root/testdata/sf0.01
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(vout: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            spark = con.sql(
                f"SELECT * FROM read_parquet('{vout}/{name}/*.parquet')")
            ora = con.sql(sql)
            cols_s = sorted(spark.columns)
            cols_o = sorted(ora.columns)
            if cols_s != cols_o:
                print(f"FAIL {name}: schema {cols_s} vs {cols_o}")
                failed.append(name)
                continue
            sel = ", ".join(f'"{c}"' for c in cols_s)
            con.execute(f"CREATE OR REPLACE VIEW _s AS SELECT {sel} FROM spark")
            con.execute(f"CREATE OR REPLACE VIEW _o AS SELECT {sel} FROM ora")
            n_s = con.sql("SELECT count(*) FROM _s").fetchone()[0]
            n_o = con.sql("SELECT count(*) FROM _o").fetchone()[0]
            diff = con.sql(
                "SELECT count(*) FROM ((SELECT * FROM _s EXCEPT ALL SELECT * FROM _o)"
                " UNION ALL (SELECT * FROM _o EXCEPT ALL SELECT * FROM _s))"
            ).fetchone()[0]
            if n_s != n_o or diff != 0:
                print(f"FAIL {name}: rows {n_s} vs {n_o}, sym_diff={diff}")
                failed.append(name)
            else:
                print(f"ok   {name}: rows={n_s}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"ERR  {name}: {e}")
            failed.append(name)
            try:  # a failed statement leaves the implicit txn aborted;
                con.execute("ROLLBACK")  # recover so later queries compare
            except Exception:  # noqa: BLE001 - nothing to roll back
                pass
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
