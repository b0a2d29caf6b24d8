"""Guard against oracle/engine dtype drift in the correctness contract.

The driver's value hash stringifies cells with their concrete dtype, so
a DuckDB oracle that leaves an aggregate sum as HUGEINT (DuckDB's
default for sum(INTEGER)) hash-mismatches a Spark BIGINT even when the
values are identical — this turned three value-correct entries red in
round 6.  Every oracle must therefore cast integral aggregates to
BIGINT.  This test DESCRIBEs every oracle_sql() entry against the real
sf0.001 views and fails if any result column types as HUGEINT or
DECIMAL, which Spark never produces from these parquet inputs.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.001"

# DuckDB types that have no Spark analog in this contract: Spark reads
# these parquet tables as bigint/double/string/array, so an oracle
# producing one of these has forgotten a cast.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"'{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_or_decimal_oracle_columns(con):
    violations = []
    for name, sql in entrymod.oracle_sql().items():
        rows = con.execute("DESCRIBE " + sql).fetchall()
        for col, typ, *_ in rows:
            if typ.startswith(_FORBIDDEN):
                violations.append((name, col, typ))
    assert not violations, (
        "oracle columns whose DuckDB type cannot hash-match Spark "
        f"(add CAST(... AS BIGINT)): {violations}")
