"""Interactive query selection (QuerySelector parity):
run a pipeline truncated at a cursor line."""

import pytest

PIPELINE = """\
from nation
where n_regionkey = 0
select n_nationkey, n_name
order by n_nationkey
limit 2
"""

MULTI = """\
from region
select r_regionkey

from nation
where n_regionkey = 1
select n_nationkey
order by n_nationkey
"""


@pytest.fixture()
def ws(spark):
    from tests.conftest import SF_DIR
    from wvlet_spark import WvletSession

    return WvletSession(spark, table_dir=SF_DIR, test_mode=False)


def test_select_text_modes():
    from wvlet_spark.selector import select_text

    assert select_text(PIPELINE, mode="all") == PIPELINE
    # cursor on `where` line: pipeline cut after the filter
    cut = select_text(PIPELINE, line=2, mode="subquery")
    assert cut.strip().endswith("where n_regionkey = 0")
    assert "select" not in cut
    # cursor at the end: whole statement
    assert "limit 2" in select_text(PIPELINE, line=5, mode="subquery")
    # describe variant appends the describe pipe
    assert select_text(PIPELINE, line=3, mode="describe").endswith("describe")


def test_select_text_multi_statement():
    from wvlet_spark.selector import select_text

    # cursor inside the second statement
    single = select_text(MULTI, line=5, mode="single")
    assert single.startswith("from nation")
    assert "from region" not in single
    before = select_text(MULTI, line=5, mode="all_before")
    assert "from region" in before and "from nation" in before
    sub = select_text(MULTI, line=5, mode="subquery")
    assert "from region" in sub  # preceding statements kept (defs may matter)
    assert sub.rstrip().endswith("where n_regionkey = 1")


def test_select_text_partial_line_dropped():
    from wvlet_spark.selector import select_text

    text = "from nation\nwhere n_regionkey >\nselect n_name\n"
    # cursor on the syntactically-incomplete where line: falls back to the
    # longest parsing prefix
    cut = select_text(text, line=2, mode="subquery")
    assert cut.strip() == "from nation"


def test_select_text_closes_braces():
    from wvlet_spark.selector import select_text

    text = "with t as {\n  from nation\n  where n_regionkey = 0\n}\nfrom t\nselect n_name\n"
    cut = select_text(text, line=3, mode="subquery")
    # the cut fell inside the brace block: closers appended, parses
    from wvlet_spark.parser import Parser

    Parser(cut).parse_statements()


def test_run_selection_preview(ws):
    full = ws.run_selection(PIPELINE, mode="all").collect()
    assert len(full) == 2
    # preview at the filter line: all region-0 nations, unprojected
    preview = ws.run_selection(PIPELINE, line=2, mode="subquery")
    assert set(preview.columns) >= {"n_nationkey", "n_name", "n_regionkey"}
    assert preview.count() >= 2
    # schema preview
    desc = ws.run_selection(PIPELINE, line=3, mode="describe").collect()
    cols = {r.column_name for r in desc}
    assert cols == {"n_nationkey", "n_name"}


def test_run_selection_multi(ws):
    df = ws.run_selection(MULTI, line=2, mode="single")
    assert df.columns == ["r_regionkey"]


def test_columns_regex_lookahead_dialect_gap(ws, duck):
    """Documented dialect divergence (round-7 ADVICE): the engine expands
    columns('regex') with Python re, which accepts lookaheads; DuckDB's
    COLUMNS() uses RE2, which rejects them.  Pin both behaviors so the
    gap stays known — and keep lookaheads out of the differential fuzz
    (tools/fuzz_differential.py sqlshape_newfns)."""
    import duckdb

    q = "from orders select columns_matching('^o_(?!c)') limit 1"
    cols = set(ws.run(q).columns)
    assert "o_orderkey" in cols and "o_custkey" not in cols
    with pytest.raises(duckdb.Error):
        duck.execute("SELECT COLUMNS('^o_(?!c)') FROM orders LIMIT 1")
