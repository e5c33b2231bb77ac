#!/usr/bin/env python3
"""Self-test of check_oracle.py's gates on synthetic verify dumps.

Builds a tiny table dir + verify-out dir with DuckDB and asserts:
  1. a value/type-identical query passes,
  2. a wide-DECIMAL result schema is rejected by the policy gate even
     when every value matches (the round-2 q59/q62 failure mode),
  3. a physical type mismatch (HUGEINT vs BIGINT) is rejected,
  4. a value mismatch is rejected.
Run: python3 tools/check_oracle_selftest.py  (exit 0 = all gates work)
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECKER = os.path.join(HERE, "check_oracle.py")


def run_checker(sf_dir, out_dir):
    p = subprocess.run([sys.executable, CHECKER, sf_dir, out_dir],
                       capture_output=True, text=True)
    return p.returncode, p.stdout


def main():
    tmp = tempfile.mkdtemp(prefix="check-oracle-selftest-")
    sf = os.path.join(tmp, "sf")
    out = os.path.join(tmp, "out")
    os.makedirs(sf)
    os.makedirs(out)
    con = duckdb.connect()
    con.sql("CREATE TABLE t(v DOUBLE, k BIGINT)")
    con.sql("INSERT INTO t VALUES (1.5, 1), (2.5, 1), (3.0, 2)")
    con.sql(f"COPY t TO '{sf}/lineitem.parquet' (FORMAT parquet)")
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")

    def spark_result(name, sql):
        os.makedirs(os.path.join(out, name), exist_ok=True)
        con.sql(f"COPY ({sql}) TO '{out}/{name}/part-0.parquet' (FORMAT parquet)")

    # 1. pass: identical types + values (sum pinned to BIGINT both sides)
    spark_result("ok_case",
                 "SELECT k, CAST(sum(v*10) AS BIGINT) AS s FROM lineitem GROUP BY k")
    # 2. wide decimal: values identical, schema carries DECIMAL(38,2)
    spark_result("wide_decimal",
                 "SELECT k, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s "
                 "FROM lineitem GROUP BY k")
    # 3. type mismatch: spark side BIGINT, oracle side leaves HUGEINT
    spark_result("type_mismatch",
                 "SELECT k, CAST(sum(k) AS BIGINT) AS s FROM lineitem GROUP BY k")
    # 4. value mismatch
    spark_result("value_mismatch",
                 "SELECT k, CAST(count(*) + 1 AS BIGINT) AS c FROM lineitem GROUP BY k")

    oracles = {
        "ok_case": "SELECT k, CAST(sum(v*10) AS BIGINT) AS s FROM lineitem GROUP BY k",
        "wide_decimal": "SELECT k, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s FROM lineitem GROUP BY k",
        "type_mismatch": "SELECT k, sum(k) AS s FROM lineitem GROUP BY k",
        "value_mismatch": "SELECT k, count(*) AS c FROM lineitem GROUP BY k",
    }
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump(oracles, f)

    code, stdout = run_checker(sf, out)
    failures = {line.split()[1].rstrip(":") for line in stdout.splitlines()
                if line.startswith("FAIL")}
    expected = {"wide_decimal", "type_mismatch", "value_mismatch"}
    ok = (code != 0 and failures == expected
          and "OK    ok_case" in stdout
          and "DECIMAL wider" in stdout)
    print(stdout)
    if ok:
        print("SELFTEST PASS: checker accepts the clean case and rejects "
              "wide-decimal / type / value divergence")
        sys.exit(0)
    print(f"SELFTEST FAIL: exit={code}, failures={sorted(failures)}, "
          f"expected={sorted(expected)}")
    sys.exit(1)


if __name__ == "__main__":
    main()
