"""Every suite entry must hash-match its DuckDB oracle at sf0.01 — the local
mirror of the driver's CORRECTNESS gate."""

import pytest

from wvlet_spark.oracle import compare
from wvlet_spark.suite import SUITE


@pytest.mark.parametrize("name", sorted(SUITE))
def test_suite_entry(name, ws, duck):
    wv, osql = SUITE[name]
    df = ws.run(wv)
    if osql is None:
        assert df.count() >= 0
        return
    if name == "sample_reservoir":
        assert df.collect()[0][0] == 100
        return
    good, msg = compare(df, duck, osql)
    assert good, f"{name}: {msg}"


def _ext_oracled():
    from wvlet_spark.ops.registry import entry_oracles

    return sorted(entry_oracles())


@pytest.mark.parametrize("name", _ext_oracled())
def test_ext_entry(name, spark, duck):
    """Extension-operator driver entries hash-match their DuckDB oracles
    at sf0.01 — with this, EVERY oracled row of the driver's CORRECTNESS
    gate has a pytest mirror on current code."""
    from tests.conftest import SF_DIR

    from wvlet_spark.ops.registry import entry_oracles, entry_queries

    df = entry_queries()[name](spark, SF_DIR)
    good, msg = compare(df, duck, entry_oracles()[name])
    assert good, f"{name}: {msg}"


def test_graded_entries_have_atomic_schemas(spark):
    """Driver-canonicalizability guard: the external harness hashes rows
    with pandas and CRASHES on list/dict cells (round-4 postmortem:
    agg_order_by / ext_quantize).  Every graded entry must therefore
    project array/map/struct results through to_json (or equivalent)
    before returning.  Schema-only — no query executes beyond the small
    driver-side probes some ops run at build time."""
    import importlib

    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entry
    importlib.reload(entry)
    offenders = []
    for name, fn in entry.queries().items():
        try:
            schema = fn(spark, "/root/testdata/sf0.01").schema
        except Exception as ex:  # entry itself broken — surface that too
            offenders.append(f"{name}: build failed: {ex}")
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, "\n".join(offenders)
