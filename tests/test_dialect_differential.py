"""Differential test of the DuckDB SQL dialect generator.

Every suite query compiles through BOTH backends of the engine's own
generator: the Spark dialect executes on Spark, the DuckDB dialect
executes on DuckDB, and the values must agree.  Unlike the hand-written
oracles (which check Spark against independent SQL), this checks the
generator's second dialect itself — the reference's multi-engine codegen
surface (GenSQL dialect split) — across the whole suite at once.
"""

import datetime
import math
import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available")

# statements with no compilable query body
SKIP = {"flow_dag_run"}


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None:
                vals.append(None)
            elif isinstance(v, float) or type(v).__name__ == "Decimal":
                f = float(v)
                vals.append(0.0 if math.isclose(f, 0, abs_tol=1e-9)
                            else round(f, 2))
            elif isinstance(v, datetime.datetime):
                vals.append(str(v))
            elif isinstance(v, datetime.date):
                # DuckDB date_trunc yields DATE where Spark yields midnight
                # TIMESTAMP — same instant, different display type
                vals.append(str(datetime.datetime.combine(
                    v, datetime.time.min)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _suite_names():
    from wvlet_spark.suite import SUITE

    return sorted(n for n in SUITE if n not in SKIP)


@pytest.mark.parametrize("name", _suite_names())
def test_dialects_agree(name, spark, duck):
    from wvlet_spark import WvletSession
    from wvlet_spark.suite import SUITE

    ws = WvletSession(spark, table_dir=SF_DIR, test_mode=False)
    wv = SUITE[name][0]
    dsql = ws.compile_to_sql(wv, "duckdb")
    exp = _norm(duck.execute(dsql).fetchall())
    got = _norm(tuple(r) for r in ws.run(wv).collect())
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    assert got == exp, f"{name}: dialect divergence\nduckdb sql: {dsql}"


def test_int_cast_of_division_truncates_like_spark(ws, duck):
    """Spark CAST(double AS BIGINT) truncates toward zero; DuckDB's CAST
    rounds half away — the DuckDB dialect must emit CAST(trunc(x) ...)
    for provably-numeric sources (property-differential find, round 5)."""
    q = ("from nation\n"
         "select n_nationkey, q = ((0 - n_nationkey - 5) / 2)::long,\n"
         "  p = ((n_nationkey + 3) / 2)::int\n"
         "order by n_nationkey")
    got = [(r.n_nationkey, r.q, r.p) for r in ws.run(q).collect()]
    exp = duck.execute(ws.oracle_sql(q)).fetchall()
    assert got == [tuple(r) for r in exp]
    # string sources must NOT be trunc()-wrapped (trunc on VARCHAR errors)
    q2 = "from nation\nselect v = '41'::long + 1\norder by v limit 1"
    assert duck.execute(ws.oracle_sql(q2)).fetchall()[0][0] == 42


def test_date_semantics_match_across_dialects(ws, duck):
    """date_trunc day-grain units and date±day-grain-interval return
    different TYPES in stock DuckDB vs Spark; the oracle dialect re-casts
    to the engine's (Spark's) types (property-differential finds)."""
    for q in (
        "from orders where o_orderkey % 101 = 0\n"
        "select o_orderkey, v = date_trunc('month', o_orderdate::date)\n"
        "order by o_orderkey limit 10",
        "from orders where o_orderkey % 103 = 0\n"
        "select o_orderkey, v = o_orderdate::date + interval 9 day\n"
        "order by o_orderkey limit 10",
        "from orders where o_orderkey % 103 = 0\n"
        "select o_orderkey, v = o_orderdate::date - interval 1 year\n"
        "order by o_orderkey limit 10",
    ):
        got = [tuple(str(v) for v in r) for r in ws.run(q).collect()]
        exp = [tuple(str(v) for v in r)
               for r in duck.execute(ws.oracle_sql(q)).fetchall()]
        assert got == exp, q


def test_sql_style_window_frames(ws, duck):
    """`rows between ... and ...` / single-bound `rows N preceding` parse
    to the same frame as the compact rows[a, b] form."""
    a = ws.run("from nation\nselect n_nationkey, w = sum(n_nationkey) over "
               "(order by n_nationkey rows between 2 preceding and "
               "current row)\norder by n_nationkey").collect()
    b = ws.run("from nation\nselect n_nationkey, w = sum(n_nationkey) over "
               "(order by n_nationkey rows[-2, 0])\n"
               "order by n_nationkey").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = ws.run("from nation\nselect n_nationkey, w = sum(n_nationkey) over "
               "(order by n_nationkey rows 2 preceding)\n"
               "order by n_nationkey").collect()
    assert [tuple(r) for r in c] == [tuple(r) for r in a]


def test_dayofweek_weekday_datediff_cross_engine(ws, duck):
    """Spark's 1-based dayofweek (Sunday=1), 0-based weekday (Monday=0),
    and 2-arg datediff(end, start) must be re-derived in DuckDB terms
    (+1 on dayofweek, isodow-1, 3-arg datediff) — property-differential
    finds, round 5."""
    q = ("from orders where o_orderkey % 97 = 0\n"
         "select o_orderkey, a = dayofweek(o_orderdate::date), "
         "b = weekday(o_orderdate::date), "
         "c = datediff('1996-06-01'::date, o_orderdate::date)\n"
         "order by o_orderkey limit 20")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp


def test_string_function_cross_engine_semantics(ws, duck):
    """Round-5 property-differential finds: 2-arg ltrim/rtrim arg order
    (Spark takes (trim_chars, str)), position(sub in str) sugar,
    char_length on DuckDB, and DuckDB list-subscript semantics for [0] /
    out-of-range (NULL, not error)."""
    q = ("from nation\n"
         "select n_nationkey, a = ltrim(n_name, 'NATIO'), "
         "b = rtrim(n_name, '0123456789'), c = position('_' in n_name), "
         "d = char_length(n_name), z = split(n_name, '_')[0], "
         "o = split(n_name, '_')[9], f = split(n_name, '_')[1]\n"
         "order by n_nationkey limit 10")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp
    assert got[0][5] is None and got[0][6] is None  # [0], [9] -> NULL


def test_statistical_aggregates_cross_engine(ws, duck):
    """Spark's skewness/kurtosis are population estimators; DuckDB's are
    sample-corrected — the oracle converts (g1 = G1*(n-2)/sqrt(n(n-1)),
    kurtosis -> kurtosis_pop).  percentile maps to quantile_cont; the SQL
    FILTER clause parses and renders on both dialects."""
    q = ("from customer\ngroup by k = (c_nationkey % 5)::long\n"
         "agg a = round(skewness(c_acctbal), 3), "
         "b = round(kurtosis(c_acctbal), 3), "
         "c = round(percentile(c_acctbal, 0.25), 3), "
         "d = count(c_acctbal) filter (where c_acctbal > 0)\n"
         "order by k")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp


def test_array_json_map_cross_engine_semantics(ws, duck):
    """Round-5 property-differential finds: json_extract scalar form,
    variadic map() -> two-list map(), sort_array -> list_sort,
    order-PRESERVING array_distinct (Spark keeps first occurrence;
    DuckDB's list_distinct is unordered — re-derived via index filter),
    aggregate(arr, init, f) -> list_reduce(list_prepend(init, arr), f),
    array_max/min -> list_max/min."""
    q = ("from nation\n"
         "select n_nationkey, "
         "a = json_extract('{\"a\": {\"b\": 7}}', '$.a.b'), "
         "b = map_values(map('a', n_nationkey))[1], "
         "c = to_json(sort_array([n_nationkey % 3, 2, 0])), "
         "d = to_json(array_distinct([1, 1, n_nationkey % 2, 2])), "
         "e = aggregate([1, 2, n_nationkey], 0, (x, y) -> x + y), "
         "f = array_max([1, n_nationkey, 5]), "
         "g = array_min([9, n_nationkey])\n"
         "order by n_nationkey limit 10")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp
    assert got[0][4] == "[1,0,2]"  # first-occurrence order preserved


def test_decimal_scale_reduction_rounds_like_spark(ws, duck):
    """Casting to a lower decimal scale rounds HALF_UP (away from zero)
    in Spark but truncates in DuckDB — the oracle pre-rounds at the
    target scale (property-differential find, round 5)."""
    q = ("from nation\n"
         "select n_nationkey, a = (-7.25::decimal(10,1))::double, "
         "b = (99.999::decimal(10,1))::double, "
         "c = (0.005::decimal(10,2))::double\n"
         "order by n_nationkey limit 3")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp
    assert got[0][1:] == (-7.3, 100.0, 0.01)


def test_frame_on_ranking_function_dropped_for_spark(ws, duck):
    """DuckDB accepts (and ignores) frames on ranking/offset window
    functions; Spark errors — the Spark dialect drops the frame for the
    rank family (SQL-import fuzz find, round 5)."""
    sql = ("SELECT n_nationkey, row_number() OVER (PARTITION BY n_regionkey "
           "ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) "
           "AS w FROM nation ORDER BY n_nationkey")
    got = [tuple(r) for r in ws.run(ws.to_wvlet(sql)).collect()]
    exp = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == exp


def test_date_format_strftime_pattern_conversion(ws, duck):
    """date_format takes Java patterns, strftime takes C patterns — the
    generator converts the LITERAL format string for the target dialect
    (a name-only mapping would render wrong dates silently).  Both
    directions, incl. literal text (quoted for Java) and strpos.
    Wide-fuzz finds, round 5 (tools/fuzz_differential.py)."""
    q = ("from orders where o_orderkey <= 40\n"
         "select o_orderkey,\n"
         "  f1 = date_format(o_orderdate, 'yyyy-MM'),\n"
         "  f2 = date_format(o_orderdate, 'dd/MM/yyyy HH:mm:ss'),\n"
         "  f3 = strftime(o_orderdate, '%Y-%m-%d'),\n"
         "  f4 = date_format(o_orderdate, 'MMM d, yyyy'),\n"
         "  f5 = strftime(o_orderdate, '%d of %B'),\n"
         "  p = strpos(o_orderpriority, '-')\n"
         "order by o_orderkey")
    got = [tuple(map(str, r)) for r in ws.run(q).collect()]
    exp = [tuple(map(str, r))
           for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp


def test_date_format_unknown_directive_rejected(ws):
    """Unsupported directives fail at compile time with a pointed error —
    never silently mis-rendered on the other dialect."""
    import pytest as _pytest

    from wvlet_spark.generator import CompileError

    with _pytest.raises(CompileError, match="unsupported date format"):
        ws.oracle_sql("from orders select x = date_format(o_orderdate, "
                      "'yyyy GG')")


def test_regexp_replace_replaces_all_matches(ws, duck):
    """Spark's regexp_replace is replace-ALL; DuckDB defaults to first
    match only — the DuckDB dialect must add the 'g' flag (wide-fuzz
    find, round 5)."""
    q = ("from part where p_partkey <= 30\n"
         "select p_partkey, x = regexp_replace(p_name, '[aeiou]', '.')\n"
         "order by p_partkey")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp


def test_int_cast_of_double_column_truncates_like_spark(ws, duck):
    """`double_col::long`: Spark truncates toward zero, DuckDB CAST
    rounds — the oracle dialect must trunc() bare fractional COLUMNS
    too, via the session's parquet-footer type lookup (wide-fuzz find,
    round 5; the expression-shape guard alone missed plain refs)."""
    q = ("from lineitem where l_orderkey <= 30\n"
         "select l_orderkey, l_linenumber, i = l_extendedprice::long\n"
         "order by l_orderkey, l_linenumber")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp


def test_indexed_lambda_base_and_polymorphic_len(ws, duck):
    """Wide-fuzz finds (round-5 arrayfns family): DuckDB's
    (element, index) lambda index is 1-based while wvlet's — like
    Spark's — is 0-based, so the DuckDB dialect shifts index references
    inside transform/filter lambda bodies (reduce lambdas untouched);
    list_sort/list_max/list_position needed Spark mappings; and
    array_position's absent-element result is aligned on Spark's 0
    (DuckDB returns NULL)."""
    q = ("from nation\n"
         "select n_nationkey, "
         "a = to_json(filter(['a', 'b', 'c'], (x, i) -> i >= 1)), "
         "b = to_json(transform([10, 20], (x, i) -> x + i)), "
         "r = aggregate([1, 2, n_nationkey], 0, (x, y) -> x + y), "
         "p = array_position(['x', 'y'], n_name), "
         "s = to_json(list_sort([3, n_nationkey % 3, 1])), "
         "m = list_max([n_nationkey, 4])\n"
         "order by n_nationkey limit 5")
    got = [tuple(r) for r in ws.run(q).collect()]
    exp = [tuple(r) for r in duck.execute(ws.oracle_sql(q)).fetchall()]
    assert got == exp
    assert got[0][1] == '["b","c"]'   # 0-based: i >= 1 keeps positions 1,2
    assert got[0][2] == "[10,21]"     # index adds 0 then 1
    assert got[0][4] == 0             # absent element -> 0 on both engines


def test_len_of_array_maps_to_size_on_spark(ws, duck):
    """DuckDB's len/length are polymorphic over strings and lists;
    Spark's length is string-only — the Spark dialect routes
    provably-array arguments through size() (import-path fuzz find,
    round 5)."""
    sql = ("SELECT n_nationkey, len(string_split(n_name, '_')) AS n, "
           "len(n_name) AS c FROM nation ORDER BY n_nationkey")
    got = [tuple(r) for r in ws.run(ws.to_wvlet(sql)).collect()]
    exp = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == exp


def test_imported_index_lambda_shifts_to_zero_base(ws, duck):
    """SQL-importer round-trip of an index lambda: DuckDB SQL written
    against the 1-based index must still produce DuckDB's values after
    conversion to wvlet and execution on Spark (round-5 find via the
    order-preserving array_distinct oracle lowering)."""
    sql = ("SELECT n_nationkey, "
           "list_filter(['a', 'b', 'c'], (x, i) -> i % 2 = 1) AS odd1, "
           "list_transform(['p', 'q'], (x, i) -> concat(x, i)) AS tagged "
           "FROM nation ORDER BY n_nationkey LIMIT 3")
    got = [(r[0], list(r[1]), list(r[2]))
           for r in ws.run(ws.to_wvlet(sql)).collect()]
    exp = [(r[0], list(r[1]), list(r[2]))
           for r in duck.execute(sql).fetchall()]
    assert got == exp
    assert got[0][1] == ["a", "c"]          # DuckDB 1-based: i%2=1 -> 1st, 3rd
    assert got[0][2] == ["p1", "q2"]


def test_sequence_nonliteral_and_interval_step_guards(ws, duck):
    """Round-7 ADVICE fixes: (a) a wrong-sign NON-literal step used to
    THROW on Spark where DuckDB's generate_series returns [] — the
    type-agnostic (s - s) zero guard converts it; (b) the same guard
    covers interval steps over dates; (c) a bare-NULL bound borrows its
    element type from the non-null bound instead of hardcoding
    array<int> (sequence(NULL, date) used to render cast(null as
    array<int>))."""
    q = ("from [[3], [0-3]] as t(x)\n"
         "select x, a = sequence(1, 5, x), b = sequence(5, 1, x),\n"
         "  c = sequence(4, 4, x)\n"
         "order by x")
    got = [(r.x, list(r.a) if r.a is not None else None,
            list(r.b) if r.b is not None else None,
            list(r.c) if r.c is not None else None)
           for r in ws.run(q).collect()]
    assert got == [(-3, [], [5, 2], [4]), (3, [1, 4], [], [4])]

    # interval step, wrong sign over dates: [] on both engines (no throw)
    q2 = ("from [[1]] as t(x)\n"
          "select n = size(sequence('2020-01-03'::date,"
          " '2020-01-01'::date, interval 1 day))")
    assert ws.run(q2).collect()[0].n == 0

    # NULL bound typed from the other bound: result is a NULL array of
    # DATE (not int) — combining with a date array must analyze
    q3 = ("from [[1]] as t(x)\n"
          "select v = concat(sequence(null, '2020-01-05'::date),\n"
          "  sequence('2020-01-01'::date, '2020-01-02'::date))")
    assert ws.run(q3).collect()[0].v is None  # concat(NULL, arr) = NULL
