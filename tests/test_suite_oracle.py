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
