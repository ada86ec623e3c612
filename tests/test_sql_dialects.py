"""Trino / Hive dialect SQL -> wvlet conversion against the reference's
dialect corpora (`spec/sql/trino`, `spec/sql/hive` — the reference's
SqlParser accepts these; parser/SqlParser.scala).

Three layers:
- CORPUS SWEEP: every statement in every file either converts (and the
  converted wvlet PARSES), or raises the documented SqlImportError for a
  known-unsupported construct.  The per-file convert/reject budget is
  pinned so coverage can only ratchet up.
- EXECUTION: self-contained converted statements (literals / VALUES) run
  on Spark; where DuckDB can run a semantically-equal form, values match.
- UNIT CASES for each dialect translation rule.
"""

import os

import pytest

SQL_DIR = "/root/reference/spec/sql"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SQL_DIR), reason="reference sql corpus not available")

# file -> (min converted statements, max rejected statements).
# Rejects are constructs with no wvlet/Spark surface, each raising a
# documented SqlImportError (message asserted below).
EXPECTED = {
    "trino/create-table-column-with.sql": (4, 0),
    "trino/create-table-like-basic.sql": (11, 0),
    "trino/create-table-like.sql": (14, 0),
    "trino/describe-input.sql": (3, 0),        # -> describe input <model>
    "trino/describe-output.sql": (4, 0),       # -> describe output <model>
    "trino/explain-syntax.sql": (15, 0),
    "trino/ip-address-literals.sql": (10, 0),
    "trino/prepare-and-describe.sql": (2, 0),
    "trino/set-session.sql": (6, 0),
    "trino/show-branches.sql": (4, 0),
    "trino/show-catalogs.sql": (4, 0),
    "trino/show-create-function.sql": (3, 0),
    "trino/show-create-materialized-view.sql": (3, 0),
    "trino/show-create-schema.sql": (2, 0),
    "trino/show-create-table.sql": (4, 0),
    "trino/show-grants.sql": (4, 0),
    "trino/show-roles.sql": (6, 0),
    "trino/show-session.sql": (1, 0),
    "trino/show-stats.sql": (3, 0),
    "trino/union-in-parentheses.sql": (5, 0),
    "trino/union-in-subquery.sql": (1, 0),
    "hive/array-angle-bracket-types.sql": (22, 0),
    "hive/div_operator.sql": (8, 0),
    "hive/hive-data-types.sql": (6, 0),
    "hive/hive-functions.sql": (7, 0),
    "hive/hive-lateral-view.sql": (7, 0),
    "hive/hive-partition-write.sql": (13, 0),
    "hive/hive-udtf.sql": (2, 0),   # each_top_k -> window; generic UDTF -> unnest
    "hive/insert-into-table.sql": (11, 0),
    "hive/insert-overwrite.sql": (1, 0),
    "hive/td-time-functions.sql": (4, 0),
    "hive/with-insert.sql": (7, 0),
}

_REJECT_MARKERS = (
    "DESCRIBE INPUT/OUTPUT", "DEALLOCATE has no", "LATERAL VIEW",
    "UDTF multi-column alias",
)


def _corpus_files():
    return sorted(EXPECTED)


@pytest.mark.parametrize("relpath", _corpus_files())
def test_dialect_corpus_converts_or_documents(relpath):
    from wvlet_spark.parser import Parser
    from wvlet_spark.sql_dialect import split_statements
    from wvlet_spark.sql_import import SqlImportError, sql_to_wvlet

    dialect = relpath.split("/")[0]
    with open(os.path.join(SQL_DIR, relpath), encoding="utf-8") as f:
        sql = f.read()
    converted = rejected = 0
    for stmt in split_statements(sql):
        try:
            wv = sql_to_wvlet(stmt, dialect=dialect)
        except SqlImportError as ex:
            assert any(m in str(ex) for m in _REJECT_MARKERS), \
                f"undocumented reject in {relpath}: {ex}"
            rejected += 1
            continue
        Parser(wv).parse_statements()  # converted text must be valid wvlet
        converted += 1
    want_ok, want_rej = EXPECTED[relpath]
    assert converted >= want_ok, \
        f"{relpath}: converted {converted} < pinned {want_ok}"
    assert rejected <= want_rej, \
        f"{relpath}: rejects {rejected} > pinned {want_rej}"


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else str(v) for v in r))
    return sorted(out)


def test_trino_union_in_parentheses_executes(spark):
    """Self-contained VALUES/UNION statements run on Spark and match
    DuckDB running the ORIGINAL SQL."""
    import duckdb

    from wvlet_spark import WvletSession
    from wvlet_spark.sql_dialect import split_statements

    with open(f"{SQL_DIR}/trino/union-in-parentheses.sql") as f:
        sql = f.read()
    ws = WvletSession(spark)
    con = duckdb.connect()
    checked = 0
    for stmt in split_statements(sql):
        wv = ws.to_wvlet(stmt, dialect="trino")
        got = _norm(tuple(r) for r in ws.run(wv).collect())
        exp = _norm(con.execute(stmt).fetchall())
        assert got == exp, f"mismatch for:\n{stmt}\n->\n{wv}"
        checked += 1
    assert checked == 5


def test_trino_ip_literal_downgrade(spark):
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    rows = ws.run_sql("SELECT IPADDRESS '192.168.1.1' as ip1",
                      dialect="trino").collect()
    assert rows[0].ip1 == "192.168.1.1"
    # identifier / function-call uses of the word stay untouched
    wv = ws.to_wvlet("SELECT ipaddress FROM VALUES ('x') as t(ipaddress)",
                     dialect="trino")
    assert "ipaddress" in wv


def test_trino_explain_options_strip(spark):
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    wv = ws.to_wvlet(
        "EXPLAIN (TYPE DISTRIBUTED, FORMAT JSON) SELECT 1 "
        "FROM (VALUES (1)) AS t(x)", dialect="trino")
    assert wv.startswith("explain")
    ws.run(wv)  # explain statement executes (prints a plan)


def test_trino_set_session_passthrough():
    from wvlet_spark.sql_import import sql_to_wvlet

    wv = sql_to_wvlet("SET SESSION distributed_join = 'true'",
                      dialect="trino")
    assert wv.startswith('execute sql"SET SESSION')


def test_trino_show_catalogs_like(spark):
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    wv = ws.to_wvlet("SHOW CATALOGS LIKE '%cat%'", dialect="trino")
    assert wv.splitlines()[0] == "show catalogs"
    assert "where name like '%cat%'" in wv
    names = {r[0] for r in ws.run("show catalogs").collect()}
    assert "spark_catalog" in names


def test_hive_div_and_angle_types_execute(spark):
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    assert ws.run_sql("SELECT 10 DIV 3 AS d", dialect="hive") \
        .collect()[0].d == 3
    r = ws.run_sql(
        "SELECT CAST(map('k', array(1, 2, 3)) AS map<string, array<int>>) "
        "AS m", dialect="hive").collect()[0]
    assert r.m == {"k": [1, 2, 3]}
    aa = ws.run_sql(
        "SELECT CAST(array(array(1, 2), array(3, 4)) AS array<array<int>>) "
        "AS aa", dialect="hive").collect()[0]
    assert aa.aa == [[1, 2], [3, 4]]


def test_hive_lateral_view_explode_executes(spark):
    from wvlet_spark import WvletSession

    spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])],
                          ["order_id", "items"]) \
        .createOrReplaceTempView("lv_orders")
    ws = WvletSession(spark)
    rows = ws.run_sql(
        "SELECT order_id, item FROM lv_orders "
        "LATERAL VIEW explode(items) items_table AS item",
        dialect="hive").collect()
    assert sorted((r.order_id, r.item) for r in rows) == \
        [(1, "a"), (1, "b"), (2, "c")]
    spark.catalog.dropTempView("lv_orders")


def test_hive_insert_into_table_roundtrip(spark, tmp_path):
    """INSERT INTO TABLE `backquoted` with Hive write hints executes:
    the converted wvlet insert writes through Spark saveAsTable."""
    from wvlet_spark import WvletSession

    old = spark.conf.get("spark.sql.warehouse.dir", None)
    ws = WvletSession(spark)
    spark.sql("DROP TABLE IF EXISTS hive_ins_tgt")
    spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], ["id", "v"]) \
        .createOrReplaceTempView("hive_ins_src")
    wv = ws.to_wvlet(
        "INSERT INTO TABLE `hive_ins_tgt` "
        "SELECT id, v FROM hive_ins_src DISTRIBUTE BY id SORT BY v DESC",
        dialect="hive")
    assert "insert into hive_ins_tgt" in wv
    assert "distribute by id" in wv and "sort by v desc" in wv
    ws.run(wv)
    got = sorted((r.id, r.v) for r in spark.table("hive_ins_tgt").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    spark.sql("DROP TABLE IF EXISTS hive_ins_tgt")
    spark.catalog.dropTempView("hive_ins_src")
    assert old == spark.conf.get("spark.sql.warehouse.dir", None)


def test_hive_with_insert_form(spark):
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    wv = ws.to_wvlet(
        "WITH temp_data AS (SELECT 1 AS a) "
        "INSERT INTO wi_target SELECT * FROM temp_data", dialect="hive")
    assert wv.startswith("insert into wi_target")
    assert "with temp_data as {" in wv


def test_hive_recursive_cte_insert_converts():
    from wvlet_spark.sql_import import sql_to_wvlet

    wv = sql_to_wvlet(
        "WITH RECURSIVE h AS ("
        " SELECT 1 AS n UNION ALL SELECT n + 1 FROM h WHERE n < 3) "
        "INSERT INTO tgt SELECT * FROM h", dialect="hive")
    assert "with recursive h as {" in wv


def test_hive_udtf_select_position_converts():
    """Generic UDTF with a multi-column alias in select position is Hive
    shorthand for a lateral view — converted to the unnest form."""
    from wvlet_spark.sql_import import sql_to_wvlet

    wv = sql_to_wvlet(
        "SELECT my_udtf(a, b) AS (c1, c2, c3) FROM t", dialect="hive")
    assert "unnest(my_udtf(a, b)) as __udtf(c1, c2, c3)" in wv
    assert "select c1, c2, c3" in wv


def test_hive_udtf_with_clauses_still_rejects():
    """The select-position rewrite only fires on a bare relation tail;
    anything richer keeps the documented reject."""
    from wvlet_spark.sql_import import SqlImportError, sql_to_wvlet

    with pytest.raises(SqlImportError, match="UDTF multi-column alias"):
        sql_to_wvlet(
            "SELECT my_udtf(a) AS (c1, c2) FROM t WHERE x > 1",
            dialect="hive")


def test_ctas_with_cluster_by_hint_documented():
    from wvlet_spark.sql_import import sql_to_wvlet

    wv = sql_to_wvlet(
        "CREATE TABLE clustered AS SELECT * FROM sales CLUSTER BY region",
        dialect="hive")
    assert "save to clustered" in wv
    assert "hive write hint dropped: cluster by region" in wv


def test_trino_prepare_converts_to_model(spark):
    """PREPARE name FROM <select with ?> -> a wvlet model whose positional
    parameters bind at run(params=[...])."""
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]) \
        .createOrReplaceTempView("prep_users")
    wv = ws.to_wvlet(
        "PREPARE my_q FROM SELECT name FROM prep_users WHERE id = ?",
        dialect="trino")
    assert wv.startswith("model my_q = {")
    ws.run(wv)
    assert [r.name for r in ws.run("from my_q", params=[2]).collect()] == ["b"]
    spark.catalog.dropTempView("prep_users")


def test_hive_posexplode_executes(spark):
    """posexplode -> the importer's positional unnest (0-origin) — Spark
    posexplode on the engine path, generate_subscripts-1 on the DuckDB
    oracle dialect; both engines agree."""
    import duckdb

    from wvlet_spark import WvletSession
    from wvlet_spark.generator import DUCKDB

    spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])],
                          ["order_id", "items"]) \
        .createOrReplaceTempView("pe_orders")
    ws = WvletSession(spark)
    wv = ws.to_wvlet(
        "SELECT order_id, pos, item FROM pe_orders "
        "LATERAL VIEW posexplode(items) t AS pos, item", dialect="hive")
    got = sorted(tuple(r) for r in ws.run(wv).collect())
    assert got == [(1, 0, "a"), (1, 1, "b"), (2, 0, "c")]
    # duckdb dialect twin of the same wvlet text
    dsql = ws.compile_to_sql(wv, dialect=DUCKDB)
    con = duckdb.connect()
    con.execute("CREATE TABLE pe_orders AS SELECT * FROM (VALUES "
                "(1, ['a','b']), (2, ['c'])) t(order_id, items)")
    exp = sorted(tuple(r) for r in con.execute(dsql).fetchall())
    assert [tuple(map(str, g)) for g in got] == \
        [tuple(map(str, e)) for e in exp]
    spark.catalog.dropTempView("pe_orders")


def test_hive_map_explode_and_inline_execute(spark):
    """2-column explode (MAP) and inline (array<struct>) convert to the
    wvlet unnest_map / unnest_struct table functions and run on Spark."""
    from wvlet_spark import WvletSession

    ws = WvletSession(spark)
    spark.sql("SELECT 1 AS uid, map('mon', 3, 'tue', 5) AS days") \
        .createOrReplaceTempView("me_t")
    rows = ws.run_sql(
        "SELECT uid, day, cnt FROM me_t "
        "LATERAL VIEW explode(days) t AS day, cnt", dialect="hive").collect()
    assert sorted(tuple(r) for r in rows) == [(1, "mon", 3), (1, "tue", 5)]

    spark.sql("SELECT 77 AS order_id").createOrReplaceTempView("iv_orders")
    rows = ws.run_sql(
        "SELECT order_id, item_id, item_name FROM iv_orders "
        "LATERAL VIEW inline(ARRAY(named_struct('id', 1, 'name', 'A'), "
        "named_struct('id', 2, 'name', 'B'))) t AS item_id, item_name",
        dialect="hive").collect()
    assert sorted(tuple(r) for r in rows) == [(77, 1, "A"), (77, 2, "B")]
    for v in ("me_t", "iv_orders"):
        spark.catalog.dropTempView(v)


def test_each_top_k_semantics(spark):
    """TD's each_top_k UDTF rewrites to the window form and returns the
    top-k rows per group by score (round-4 lift)."""
    from wvlet_spark import WvletSession

    ws = WvletSession(spark, test_mode=False)
    ws.run('from [[1, "a", 10.0], [1, "b", 30.0], [1, "c", 20.0], '
           '[2, "d", 5.0], [2, "e", 7.0]] as t(gid, tag, score)\n'
           'save to etk_src')
    rows = [tuple(r) for r in ws.run_sql(
        "SELECT each_top_k(2, gid, score, gid, tag) "
        "AS (rank, score, gid, tag) FROM etk_src",
        dialect="hive").orderBy("gid", "rank").collect()]
    assert rows == [(1, 30.0, 1, "b"), (2, 20.0, 1, "c"),
                    (1, 7.0, 2, "e"), (2, 5.0, 2, "d")]


def test_split_statements_keyword_separated():
    """No-semicolon files (spec/sql/basic/at-alias.sql style) split before
    depth-0 SELECTs; UNION/CTE/subquery SELECTs stay attached."""
    from wvlet_spark.sql_dialect import split_statements

    sql = (
        "-- first\n"
        "SELECT * FROM VALUES (1, 'a') t(id, name)\n\n"
        "-- second\n"
        "SELECT 1 AS x\n"
        "UNION ALL SELECT 2 AS x\n\n"
        "WITH c AS (SELECT 3 AS y)\n"
        "SELECT * FROM c\n\n"
        "SELECT (SELECT max(4)) AS z"
    )
    parts = split_statements(sql)
    assert len(parts) == 4, parts
    assert parts[1].lower().count("select") == 2  # union kept together
    assert parts[2].lower().startswith("with")    # CTE main select kept


def test_split_statements_semicolons_disable_keyword_split():
    """Files that use `;` never keyword-split (INSERT..SELECT and
    PREPARE..FROM SELECT must stay whole)."""
    from wvlet_spark.sql_dialect import split_statements

    sql = ("INSERT INTO t\nSELECT * FROM s;\n"
           "PREPARE p FROM\nSELECT * FROM s;")
    parts = split_statements(sql)
    assert len(parts) == 2
    assert parts[0].lower().startswith("insert")
    assert "select" in parts[0].lower()
