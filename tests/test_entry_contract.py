"""Driver-contract conformance: every queries() entry runs at sf0.001 and
SQL-expressible ones match their DuckDB oracle (row count + column names +
order-insensitive value hash) — a local mirror of the driver's gate."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tools.check_oracles import TABLES, table_hash

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "cluster_id", "is_canonical"}


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_match(spark, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entry_mod.oracle_sql()[name])
    ocols = [c.lower() for c in rel.columns]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(scols, srows) == table_hash(ocols, orows)


@pytest.mark.parametrize(
    "name", sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()) - {"near_dup_clusters"})
)
def test_rows_only_queries_run(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_py_files_artifact_builds():
    """package.sh builds the spark-submit --py-files zip (the north rule's
    literal launch mode, smoke-run on a 2-executor local-cluster in round 6
    — SURVEY §13): the archive must carry the full package, importable from
    an executor's PYTHONPATH, with no __pycache__ payload."""
    import subprocess
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["bash", "package.sh"], cwd=repo, check=True, capture_output=True
    )
    zpath = os.path.join(repo, "camden_spark.zip")
    try:
        names = zipfile.ZipFile(zpath).namelist()
        assert "camden_spark/__init__.py" in names
        assert "camden_spark/plans/pipeline.py" in names
        assert not any("__pycache__" in n for n in names)
    finally:
        os.remove(zpath)


def test_registry_fits_driver_gate():
    """The driver's correctness check covers at most 50 queries() entries in
    dict order (round 5 registered 53 and the truncated tail silently
    dropped the entry() flagship) — pin the registry at ≤ 50 so every
    registered query gets a driver row, flagship included."""
    q = entry_mod.queries()
    assert len(q) <= 50
    assert "near_dup_clusters" in q


@pytest.mark.parametrize(
    "name", sorted(__import__("camden_spark.entry_queries",
                              fromlist=["RETIRED_ORACLES"]).RETIRED_ORACLES)
)
def test_retired_oracle_match(spark, duck, name):
    """Queries retired from the 50-entry driver registry (their oracles were
    verbatim duplicates of still-registered ones) keep the SAME
    rows+schema+hash verification here."""
    from camden_spark.entry_queries import RETIRED_ORACLES

    fn, sql = RETIRED_ORACLES[name]
    sdf = fn(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    ocols = [c.lower() for c in rel.columns]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(scols, srows) == table_hash(ocols, orows)
