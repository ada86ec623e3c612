"""CLI entry point (`python -m wvlet_spark`)."""

import io
import sys

import pytest


def _capture(argv):
    from wvlet_spark.__main__ import main

    old = sys.stdout
    sys.stdout = buf = io.StringIO()
    try:
        rc = main(argv)
    finally:
        sys.stdout = old
    return rc, buf.getvalue()


def test_cli_compile():
    rc, out = _capture(
        ["compile", "-q", "from nation where n_regionkey = 0 select n_name"])
    assert rc == 0
    assert out.strip() == \
        "SELECT n_name FROM nation WHERE ((n_regionkey = 0))"


def test_cli_compile_duckdb_dialect():
    rc, out = _capture(
        ["compile", "--dialect", "duckdb",
         "-q", "from t group by k agg c = _.count"])
    assert rc == 0
    assert "COUNT(*) AS c" in out and "GROUP BY k" in out


def test_cli_to_wvlet_dialects():
    rc, out = _capture(["to-wvlet", "-q", "SELECT 1 AS x"])
    assert rc == 0 and out.strip() == "select x = 1"
    rc, out = _capture(
        ["to-wvlet", "--sql-dialect", "hive", "-q", "SELECT 10 DIV 3 AS d"])
    assert rc == 0 and out.strip() == "select d = (10 // 3)"


def test_cli_run(spark):
    """cmd_run reuses the active SparkSession via getOrCreate."""
    from tests.conftest import SF_DIR

    rc, out = _capture(
        ["run", "--table-dir", SF_DIR, "--cpus", "4",
         "-q", "from region order by r_regionkey limit 2"])
    assert rc == 0
    assert "AFRICA" in out and "AMERICA" in out and "2 rows" in out


def test_cli_run_file(spark, tmp_path):
    from tests.conftest import SF_DIR

    f = tmp_path / "q.wv"
    f.write_text("from nation count\n")
    rc, out = _capture(["run", "--table-dir", SF_DIR, "--cpus", "4", str(f)])
    assert rc == 0
    assert "25" in out
