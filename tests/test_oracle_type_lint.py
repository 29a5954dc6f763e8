"""Oracle output-type lint (r10 verdict Next #2).

DuckDB types a bare ``SUM(BIGINT)`` as HUGEINT (int128); the driver's
pandas/Arrow fetch path renders that as ``1999000000000.0`` (float64)
or ``Decimal('1999000000000')`` while Spark's LongType stringifies as
``1999000000000`` — a hash-only mismatch with rows+schema green that
cost rounds 8-10 of misdirected race forensics.  This test DESCRIBEs
every registered oracle in DuckDB (no query execution, so it is fast)
and fails on any output column typed HUGEINT/UHUGEINT/DECIMAL(38,0).
The convention it enforces: integral oracle aggregates must be written
``CAST(SUM(x) AS BIGINT)``.

DuckDB-only — no SparkSession needed, so it runs in well under a
second and belongs in every CI pass.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_registry_nonempty():
    assert len(_oracles()) > 100  # sanity: the full registry loaded


def test_no_hugeint_or_wide_decimal_outputs(duck_con):
    from tools.verify_oracle import lint_oracle_types

    bad = lint_oracle_types(duck_con, _oracles())
    assert bad == [], (
        "oracle output columns with driver-hash-breaking DuckDB types "
        "(wrap integral aggregates in CAST(... AS BIGINT)): " + repr(bad)
    )
