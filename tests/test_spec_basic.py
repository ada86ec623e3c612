"""Spec-parity tests ported from the reference's spec/basic/*.wv corpus
(window-chain, tuple-in variants, partial/function defs, struct/map/array
access, casts, select-as, pivot-agg-in, ...).  Expected values mirror the
reference test assertions, adapted to the shared testdata tables."""

import decimal

import pytest


@pytest.fixture(scope="module")
def ws(spark):
    from tests.conftest import SF_DIR
    from wvlet_spark import WvletSession

    return WvletSession(spark, table_dir=SF_DIR, test_mode=False)


def rows(ws, wv, params=None):
    out = []
    for r in ws.run(wv, params=params).collect():
        out.append(tuple(float(v) if isinstance(v, decimal.Decimal) else v
                         for v in r))
    return out


# -- window-chain.wv: window over an aggregated relation --------------------

def test_window_over_agg_chain(ws):
    got = rows(ws, """
from [[1, 5.1], [1, 7.2], [2, 9.3]] as t(g, v)
group by g
agg local_sum = v.sum
add total = (local_sum.sum over ()).round(1)
order by g
""")
    assert got == [(1, 12.3, 21.6), (2, 9.3, 21.6)]


# -- tuple-in.wv / tuple-in-subquery.wv / tuple-not-in-subquery.wv ----------

def test_tuple_in_literal_list(ws):
    got = rows(ws, """
from [[1, 'a', 10], [2, 'b', 20], [3, 'c', 30]] as t(id, name, value)
where (id, name) in ((1, 'a'), (2, 'b'))
select id order by id
""")
    assert got == [(1,), (2,)]


def test_tuple_in_subquery(ws):
    got = rows(ws, """
from [[1, 'a', 10], [2, 'b', 20], [3, 'c', 30]] as t(id, name, value)
where (id, name) in {
  from [[1, 'a'], [2, 'b']] as s(sid, sname)
  select sid, sname
}
select id order by id
""")
    assert got == [(1,), (2,)]


def test_tuple_not_in_subquery(ws):
    got = rows(ws, """
from [[1, 'a', 10], [2, 'b', 20], [3, 'c', 30]] as t(id, name, value)
where (id, name) not in {
  from [[1, 'a'], [2, 'b']] as s(sid, sname)
  select sid, sname
}
select id order by id
""")
    assert got == [(3,)]


# -- dot-apply.wv / method_chain.wv / function-nested.wv --------------------

def test_dot_apply_on_literal(ws):
    assert rows(ws, "select v = 1.234.round(1)") == [(1.2,)]


def test_method_chain_to_string(ws):
    got = rows(ws, "from [[1, 14]] as p(id, age)\nselect age_group = (age / 10).round(1).to_string")
    assert got == [("1.4",)]


def test_function_nested_two_levels(ws):
    got = rows(ws, """
def fn_double(x: int): int = x + x
def fn_quad(x: int): int = fn_double(x) + fn_double(x)
select v = fn_quad(3)
""")
    assert got == [(12,)]


def test_function_nested_three_levels(ws):
    got = rows(ws, """
def fnd(x: int): int = x + x
def fnq(x: int): int = fnd(x) + fnd(x)
def fno(x: int): int = fnq(x) + fnq(x)
select v = fno(2)
""")
    assert got == [(16,)]


# -- order-index.wv / trailing-comma.wv -------------------------------------

def test_order_by_positions_mixed_direction(ws):
    got = rows(ws, "from [[1, 3], [1, 2], [2, 1]] as t(a, b)\norder by 1, 2 desc")
    assert got == [(1, 3), (1, 2), (2, 1)]


def test_trailing_comma_in_select(ws):
    got = rows(ws, "from nation\nselect\n  n_nationkey,\n  n_name,\norder by n_nationkey\nlimit 2")
    assert got == [(0, "NATION_0"), (1, "NATION_1")]


# -- null-cast.wv / cast_any.wv ---------------------------------------------

def test_null_casts(ws):
    assert rows(ws, "select a = null::int, b = null::string, c = null::date") == [(None, None, None)]


def test_to_typed_cast_methods(ws):
    got = rows(ws, "select a = null.to_int, b = 17.4.to_string, c = ceiling(17.4).to_int")
    assert got == [(None, "17.4", 18)]


# -- string-concat.wv / regexp.wv -------------------------------------------

def test_string_plus_concat(ws):
    assert rows(ws, "select v = 'hello' + ' wvlet!'") == [("hello wvlet!",)]


def test_string_plus_number(ws):
    assert rows(ws, "select v = 'n=' + 42") == [("n=42",)]


def test_regexp_backslash_class(ws):
    # backslashes in wvlet strings must survive Spark's literal escaping
    got = rows(ws, r"select v = regexp_replace('regexp_0123', '[_-]\d+', '')")
    assert got == [("regexp",)]


# -- map.wv / struct.wv / array_access.wv / array_agg.wv --------------------

def test_map_literal(ws):
    got = rows(ws, 'select m = map {"a": 1, "b": 2}')
    assert got[0][0] == {"a": 1, "b": 2}


def test_struct_field_access(ws):
    got = rows(ws, "select obj = {'i': 3, 's': 'str'}\nselect obj.i, obj.s")
    assert got == [(3, "str")]


def test_struct_bracket_access(ws):
    got = rows(ws, "select obj = {'i': 3, 's': 'str'}\nselect a = obj['i'], b = obj['s']")
    assert got == [(3, "str")]


def test_array_one_origin_access(ws):
    got = rows(ws, "from [[1, [10, 20, 30]]] as arr_tbl(id, arr)\nselect a1 = arr[1], a2 = arr[2]")
    assert got == [(10, 20)]


def test_array_agg_to_array(ws):
    got = rows(ws, """
from [[1, 'a'], [1, 'b'], [2, 'c']] as tbl(id, v)
group by id
agg arr = v.to_array
select id, n = size(arr)
order by id
""")
    assert got == [(1, 2), (2, 1)]


# -- select-as.wv ------------------------------------------------------------

def test_select_as_registers_named_result(ws):
    got = rows(ws, "from nation\nwhere n_regionkey = 0\nselect as spec_reg0\nfrom spec_reg0 count")
    assert got == [(5,)]


# -- agg_having.wv / filter-agg.wv / nested_filter_with_agg.wv ---------------

def test_having_via_where_after_group(ws):
    got = rows(ws, "from orders group by o_orderpriority where _.count >= 1 select o_orderpriority order by o_orderpriority limit 1")
    assert got == [("1-URGENT",)]


def test_filter_then_group_single(ws):
    got = rows(ws, "from [[1, 'alice', 10], [2, 'bob', 20]] as person(id, name, age)\nwhere id = 1\ngroup by age\nselect age")
    assert got == [(10,)]


def test_positional_group_ref_after_having(ws):
    got = rows(ws, "from orders\nwhere o_custkey <= 100\ngroup by o_custkey\nwhere _.count >= 1\nselect _1\norder by 1\nlimit 2")
    assert len(got) == 2


# -- backquote.wv / if-else.wv / case.wv / lambda.wv -------------------------

def test_backquoted_column(ws):
    got = rows(ws, "from nation select n_name, `n_nationkey` order by `n_nationkey` limit 1")
    assert got == [("NATION_0", 0)]


def test_if_function_form(ws):
    assert rows(ws, "select v = if(1 < 2, 'yes', 'no')") == [("yes",)]


def test_case_without_end(ws):
    assert rows(ws, "select v = case when 1 > 2 then 'a' else 'b'") == [("b",)]


def test_lambda_transform_literal(ws):
    got = rows(ws, "select v = transform([1,2,3], x -> x * 2)")
    assert list(got[0][0]) == [2, 4, 6]


# -- concat-values.wv / dedup.wv / prepend.wv / sample.wv --------------------

def test_concat_values(ws):
    got = rows(ws, "from [[1]] as a(x)\nconcat { from [[2]] as b(x) }\norder by x")
    assert got == [(1,), (2,)]


def test_dedup_rows(ws):
    got = rows(ws, "from [[1], [1], [2]] as t(x)\ndedup\norder by x")
    assert got == [(1,), (2,)]


def test_prepend_column(ws):
    got = rows(ws, "from nation\nselect n_nationkey, n_name\nprepend flag = n_nationkey * 10\norder by n_nationkey limit 1")
    assert got == [(0, 0, "NATION_0")]


def test_sample_rows(ws):
    got = rows(ws, "from nation\nsample 5\nselect n_nationkey")
    assert len(got) == 5


# -- pivot-agg-in.wv / unnest.wv / string-interpolation.wv -------------------

def test_pivot_with_in_values(ws):
    got = rows(ws, "from orders\npivot on o_orderstatus in ('F', 'O')\nagg _.count")
    assert len(got) == 1 and len(got[0]) == 2


def test_unnest_with_alias(ws):
    assert rows(ws, "from unnest([1,2,3]) as t(x)\nagg n = _.count") == [(3,)]


def test_string_interpolation_with_expr(ws):
    got = rows(ws, 'from nation where n_nationkey = 1 select v = s"key=${n_nationkey + 1}"')
    assert got == [("key=2",)]


def test_between_method_form(ws):
    got = rows(ws, "from [[15]] as t(age)\nwhere age.between(10, 30)\nselect age")
    assert got == [(15,)]


def test_triple_quoted_string(ws):
    got = rows(ws, 'select v = """multi\nline"""')
    assert got == [("multi\nline",)]


# -- lateral (relation.scala Lateral) ----------------------------------------

def test_lateral_correlated_subquery(ws):
    got = rows(ws, """
from region, lateral {
  from nation
  where n_regionkey = r_regionkey
  select top_nation = max(n_name)
} as t
select r_name, top_nation
order by r_name
""")
    assert len(got) == 5 and got[0][0] == "AFRICA"
    assert all(tn.startswith("NATION_") for _, tn in got)


def test_lateral_unnest(ws):
    got = rows(ws, """
from [[1, [10, 20]], [2, [30]]] as t(id, arr), lateral unnest(arr) as u(x)
select id, x
order by id, x
""")
    assert got == [(1, 10), (1, 20), (2, 30)]
