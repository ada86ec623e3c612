"""The correctness query suite: wvlet text + independent DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 against the
driver's testdata tables (region nation customer supplier part orders
lineitem events documents embeddings).  The wvlet text is compiled and run
by the engine on Spark; the oracle SQL is hand-written ANSI SQL executed by
DuckDB — the driver hash-compares both sides.

Determinism rules (so value hashes match across engines):
- money doubles are cast to DECIMAL(18,2) *before* aggregation — decimal
  sums are exact and order-independent (double sums are not, at scale)
- averages are computed as exact decimal sums divided as DOUBLE
- every computed column is aliased identically on both sides
- ORDER BY carries full tie-breaks where order matters
"""

from __future__ import annotations

# name -> (wvlet_text, oracle_sql or None)
SUITE: dict[str, tuple[str, str | None]] = {}


def q(name: str, wv: str, oracle: str | None):
    # a silent overwrite once clobbered four multi-round-green entries
    # (round-5 postmortem: duplicate tpch_q*_like registrations) — fail loud
    assert name not in SUITE, f"duplicate suite entry: {name}"
    SUITE[name] = (wv, oracle)


# ---------------------------------------------------------------------------
# TPC-H-ish relational core
# ---------------------------------------------------------------------------

q(
    "tpch_q1",
    """
from lineitem
where l_shipdate <= '1998-09-02'::date
group by l_returnflag, l_linestatus
select
  l_returnflag,
  l_linestatus,
  sum_qty        = l_quantity::decimal(18,2).sum::double,
  sum_base_price = l_extendedprice::decimal(18,2).sum::double,
  sum_disc_price = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double,
  sum_charge     = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2)) * (1 + l_tax::decimal(18,2))).sum::double,
  avg_qty        = (l_quantity::decimal(18,2).sum::double / _.count)::double,
  avg_price      = (l_extendedprice::decimal(18,2).sum::double / _.count)::double,
  avg_disc       = (l_discount::decimal(18,2).sum::double / _.count)::double,
  count_order    = _.count
order by l_returnflag, l_linestatus
""",
    """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
  CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)

q(
    "tpch_q3",
    """
from customer, orders, lineitem
where c_mktsegment = 'BUILDING'
  and c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate < '1995-03-15'::date
  and l_shipdate > '1995-03-15'::date
group by l_orderkey, o_orderdate, o_orderpriority
select
  l_orderkey,
  revenue = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double,
  o_orderdate,
  o_orderpriority
order by revenue desc, o_orderdate, l_orderkey
limit 10
""",
    """
SELECT
  l_orderkey,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)

q(
    "tpch_q5",
    """
from customer, orders, lineitem, supplier, nation, region
where c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and l_suppkey = s_suppkey
  and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'ASIA'
  and o_orderdate >= '1996-01-01'::date
  and o_orderdate < '1997-01-01'::date
group by n_name
select
  n_name,
  revenue = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
order by revenue desc, n_name
""",
    """
SELECT
  n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)

q(
    "tpch_q6",
    """
from lineitem
where l_shipdate >= '1996-01-01'::date
  and l_shipdate < '1997-01-01'::date
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
select revenue = (l_extendedprice::decimal(18,2) * l_discount::decimal(18,2)).sum::double
""",
    """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)

q(
    "tpch_q10_like",
    """
from customer, orders, lineitem, nation
where c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate >= '1996-10-01'::date
  and o_orderdate < '1997-01-01'::date
  and l_returnflag = 'R'
  and c_nationkey = n_nationkey
group by c_custkey, c_name, n_name, c_mktsegment
select
  c_custkey, c_name,
  revenue = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double,
  n_name, c_mktsegment
order by revenue desc, c_custkey
limit 20
""",
    """
SELECT
  c_custkey, c_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  n_name, c_mktsegment
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-10-01'
  AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)

# correlated scalar subquery (Q2/Q17 pattern)
q(
    "scalar_subquery_corr",
    """
from part
where p_retailprice = {
  from part as p2
  where p2.p_brand = part.p_brand
  select p2.p_retailprice.min
}
select p_partkey, p_brand, p_retailprice
order by p_brand, p_partkey
""",
    """
SELECT p_partkey, p_brand, p_retailprice
FROM part
WHERE p_retailprice = (
  SELECT min(p2.p_retailprice) FROM part AS p2 WHERE p2.p_brand = part.p_brand
)
ORDER BY p_brand, p_partkey
""",
)

# IN-subquery (semi-join pattern, Q18-ish)
q(
    "in_subquery",
    """
from orders
where o_orderkey in {
  from lineitem
  group by l_orderkey
  where l_quantity.sum > 300
  select l_orderkey
}
group by o_orderpriority
agg n = _.count, total = o_totalprice::decimal(18,2).sum::double
order by o_orderpriority
""",
    """
SELECT o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# EXISTS / NOT EXISTS (Q4 / anti-join pattern)
q(
    "exists_subquery",
    """
from orders
where o_orderdate >= '1996-07-01'::date
  and o_orderdate < '1996-10-01'::date
  and exists {
    from lineitem
    where l_orderkey = o_orderkey and l_shipdate > '1995-06-01'::date
  }
group by o_orderpriority
agg order_count = _.count
order by o_orderpriority
""",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01'
  AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > DATE '1995-06-01'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

q(
    "anti_join_not_in",
    """
from customer
where c_custkey not in { from orders select o_custkey }
select n_lost = _.count
""",
    """
SELECT count(*) AS n_lost
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)

# outer joins + using-join + coalesce
q(
    "left_join_agg",
    """
from customer
left join orders on c_custkey = o_custkey
group by c_mktsegment
select
  c_mktsegment,
  n_orders = o_orderkey.count,
  n_customers = c_custkey.count_distinct
order by c_mktsegment
""",
    """
SELECT c_mktsegment,
       count(o_orderkey) AS n_orders,
       count(DISTINCT c_custkey) AS n_customers
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)

# window functions with frames
q(
    "window_rank",
    """
from orders
where o_orderdate >= '1997-01-01'::date
add rnk = rank() over (partition by o_orderpriority order by o_totalprice desc, o_orderkey)
where rnk <= 3
select o_orderpriority, rnk, o_orderkey, o_totalprice
order by o_orderpriority, rnk, o_orderkey
""",
    """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
FROM (
  SELECT *, rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01'
) t
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk, o_orderkey
""",
)

# round-7 pool consolidation: one entry covering the whole non-rank
# window surface (compact moving frame, unbounded frame, lag/lead,
# first/last, ntile, IGNORE NULLS) — replaces the four near-duplicate
# window_{frame_moving,lag_lead,first_last,ignore_nulls} entries per the
# round-6 verdict's staleness-budget advice
q(
    "window_mixed",
    """
from events
where user_id <= 20
select
  user_id, event_id, ts,
  prev_value = lag(value) over (partition by user_id order by ts, event_id)::double,
  next_type = lead(event_type) over (partition by user_id order by ts, event_id),
  first_ev = first_value(event_id) over (partition by user_id order by ts, event_id),
  last_val = last_value(value) over (partition by user_id order by ts, event_id
                                     rows[, ])::double,
  nt = ntile(4) over (partition by user_id order by ts, event_id),
  mv = value::decimal(18,2).sum over (partition by user_id order by ts, event_id rows[-2,0])::double,
  last_err = last_value(if event_type = 'error' then value else null) ignore nulls
             over (partition by user_id order by ts, event_id)::double
order by user_id, ts, event_id
""",
    """
SELECT
  user_id, event_id, ts,
  CAST(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS prev_value,
  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_ev,
  CAST(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_val,
  ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt,
  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv,
  CAST(last_value(CASE WHEN event_type = 'error' THEN value ELSE NULL END IGNORE NULLS)
       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS last_err
FROM events
WHERE user_id <= 20
ORDER BY user_id, ts, event_id
""",
)

# round-7 pool consolidation: extract() in WHERE + per-row extract()
# projections + format-pattern translation in one entry — replaces
# extract_parts and date_fmt_patterns
q(
    "date_parts_fmt",
    """
from orders
where extract(year from o_orderdate) = 1995 and o_orderkey <= 2000
select o_orderkey,
  y = extract(year from o_orderdate)::long,
  m = extract(month from o_orderdate)::long,
  ym = date_format(o_orderdate, 'yyyy-MM'),
  pretty = date_format(o_orderdate, 'MMM d, yyyy'),
  cfmt = strftime(o_orderdate, '%d of %B'),
  dow3 = date_format(o_orderdate, 'EEE'),
  wk = strpos(date_format(o_orderdate, 'EEE'), 'S')::long
order by o_orderkey
""",
    """
SELECT o_orderkey,
  CAST(extract(YEAR FROM o_orderdate) AS BIGINT) AS y,
  CAST(extract(MONTH FROM o_orderdate) AS BIGINT) AS m,
  strftime(o_orderdate, '%Y-%m') AS ym,
  strftime(o_orderdate, '%b %-d, %Y') AS pretty,
  strftime(o_orderdate, '%d of %B') AS cfmt,
  strftime(o_orderdate, '%a') AS dow3,
  CAST(strpos(strftime(o_orderdate, '%a'), 'S') AS BIGINT) AS wk
FROM orders
WHERE extract(YEAR FROM o_orderdate) = 1995 AND o_orderkey <= 2000
ORDER BY o_orderkey
""",
)

# column ops: add / exclude / rename / shift / transform / prepend
q(
    "column_ops",
    """
from nation
add label = s"nation ${n_name}"
rename n_name as name
exclude n_regionkey
shift name
transform label = upper(label)
order by n_nationkey
""",
    """
SELECT name, n_nationkey, upper(label) AS label FROM (
  SELECT n_nationkey, n_name AS name, concat('nation ', n_name) AS label
  FROM nation
) t
ORDER BY n_nationkey
""",
)

# group by without agg (default any_value/arbitrary) — 1-row groups for determinism
q(
    "groupby_default_agg",
    """
from nation
group by n_nationkey
order by n_nationkey
""",
    """
SELECT n_nationkey, arbitrary(n_nationkey) AS "arbitrary(n_nationkey)",
       arbitrary(n_name) AS "arbitrary(n_name)",
       arbitrary(n_regionkey) AS "arbitrary(n_regionkey)"
FROM nation GROUP BY n_nationkey ORDER BY n_nationkey
""",
)

# HAVING via where-after-group-by
q(
    "having_filter",
    """
from lineitem
group by l_orderkey
where _.count >= 6
agg n_lines = _.count, qty = l_quantity::decimal(18,2).sum::double
order by l_orderkey
limit 50
""",
    """
SELECT l_orderkey, count(*) AS n_lines,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) >= 6
ORDER BY l_orderkey
LIMIT 50
""",
)

# dot-aggregation variety: count_distinct / max_by / min_by / count_if / approx
q(
    "agg_sugar",
    """
from orders
group by o_orderstatus
select
  o_orderstatus,
  n = _.count,
  n_cust = _.count_distinct(o_custkey),
  top_order = _.max_by(o_orderkey, o_totalprice),
  n_urgent = _.count_if(o_orderpriority = '1-URGENT'),
  max_price = o_totalprice.max::double
order by o_orderstatus
""",
    """
SELECT
  o_orderstatus,
  count(*) AS n,
  count(DISTINCT o_custkey) AS n_cust,
  max_by(o_orderkey, o_totalprice) AS top_order,
  CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
  CAST(max(o_totalprice) AS DOUBLE) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)

# case / if expressions
q(
    "case_if_expr",
    """
from part
select
  p_partkey,
  size_class = case
    when p_size < 10 then 'small'
    when p_size < 30 then 'medium'
    else 'large',
  pricey = if p_retailprice > 1500 then 'yes' else 'no'
order by p_partkey
limit 100
""",
    """
SELECT
  p_partkey,
  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
  CASE WHEN p_retailprice > 1500 THEN 'yes' ELSE 'no' END AS pricey
FROM part
ORDER BY p_partkey
LIMIT 100
""",
)

# string functions + interpolation + like
q(
    "string_funcs",
    """
from documents
where lang like 'e%'
select
  doc_id,
  head = substring(text, 1, 20),
  n_up = upper(source),
  ln = length(text),
  tagged = s"[${lang}] ${source}"
order by doc_id
limit 200
""",
    """
SELECT
  doc_id,
  substring(text, 1, 20) AS head,
  upper(source) AS n_up,
  length(text) AS ln,
  concat('[', lang, '] ', source) AS tagged
FROM documents
WHERE lang LIKE 'e%'
ORDER BY doc_id
LIMIT 200
""",
)

# date functions
q(
    "date_funcs",
    """
from orders
group by ym = date_trunc('month', o_orderdate)
agg n = _.count, total = o_totalprice::decimal(18,2).sum::double
order by ym
""",
    """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS ym, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY date_trunc('month', o_orderdate)
ORDER BY ym
""",
)

# date-pattern rendering across dialects: date_format takes Java
# DateTimeFormatter patterns, strftime takes C patterns — the generator
# converts the literal pattern per target (generator._java_fmt_to_c /
# _c_fmt_to_java; wide-fuzz find, round 5).  The oracle is hand-written
# strftime, so it also pins the Java->C table independently.
# TIME type (round-5: Spark 4.1 spark.sql.timeType.enabled, set by
# WvletSession) — literal, cast, part extraction, comparison; results
# projected through ::string so the two engines' TIME renderings compare
q(
    "time_type",
    """
from nation
where n_nationkey <= 5
select
  n_nationkey,
  t = '10:30:45'::time::string,
  h = hour('10:30:45'::time)::long,
  m = minute('23:59:07'::time)::long,
  later = ('11:00:00'::time > '10:30:45'::time)
order by n_nationkey
""",
    """
SELECT n_nationkey,
       CAST(CAST('10:30:45' AS TIME) AS VARCHAR) AS t,
       CAST(hour(CAST('10:30:45' AS TIME)) AS BIGINT) AS h,
       CAST(minute(CAST('23:59:07' AS TIME)) AS BIGINT) AS m,
       CAST('11:00:00' AS TIME) > CAST('10:30:45' AS TIME) AS later
FROM nation
WHERE n_nationkey <= 5
ORDER BY n_nationkey
""",
)

# CTE / with
q(
    "with_cte",
    """
with big as {
  from orders
  where o_totalprice > 200000
}
from big
join customer on c_custkey = o_custkey
group by c_mktsegment
agg n = _.count
order by c_mktsegment
""",
    """
WITH big AS (SELECT * FROM orders WHERE o_totalprice > 200000)
SELECT c_mktsegment, count(*) AS n
FROM big JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)

# natural join: implicit equi-join on same-named columns, shared
# columns once in the output (first-class pipe, round 5)
q(
    "natural_join",
    """
from {
  from nation
  group by n_regionkey
  agg nations = _.count
} as a
natural join {
  from region
  select n_regionkey = r_regionkey, r_name
} as b
order by n_regionkey
""",
    """
SELECT a.n_regionkey, a.nations, b.r_name
FROM (SELECT n_regionkey, count(*) AS nations FROM nation
      GROUP BY n_regionkey) a
NATURAL JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) b
ORDER BY n_regionkey
""",
)

# lateral join: correlated subquery as a join operand
# (reference: relation.scala Lateral)
q(
    "lateral_join",
    """
from region, lateral {
  from nation
  where n_regionkey = r_regionkey
  select top_nation = max(n_name), n_in_region = count(*)
} as t
select r_name, top_nation, n_in_region
order by r_name
""",
    """
SELECT r_name, top_nation, n_in_region
FROM region, LATERAL (
  SELECT max(n_name) AS top_nation, CAST(count(*) AS BIGINT) AS n_in_region
  FROM nation WHERE n_regionkey = r_regionkey
) AS t
ORDER BY r_name
""",
)

# `at time zone`: interpret a naive timestamp as UTC, take the wall clock
# in the target zone (reference: exprs.scala AtTimeZone)
q(
    "at_time_zone",
    """
from events
where event_id <= 200
select
  event_id,
  tokyo_hour = extract(hour from ts::timestamp at time zone 'Asia/Tokyo')::long,
  ny_hour = extract(hour from ts::timestamp at time zone 'America/New_York')::long
order by event_id
""",
    """
SELECT event_id,
  CAST(extract(hour FROM (CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo') AS BIGINT) AS tokyo_hour,
  CAST(extract(hour FROM (CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York') AS BIGINT) AS ny_hour
FROM events WHERE event_id <= 200 ORDER BY event_id
""",
)

# recursive CTE: walk the nation chain 0 -> 9, joining nation at each step
# (native WITH RECURSIVE on both Spark >= 4.0 and DuckDB;
# reference: wvlet-lang relation.scala WithQuery(isRecursive))
q(
    "recursive_cte",
    """
with recursive chain as {
  from nation
  where n_nationkey = 0
  select n_nationkey, n_name
  concat {
    from chain, nation
    where nation.n_nationkey = chain.n_nationkey + 1
      and nation.n_nationkey <= 9
    select nation.n_nationkey, nation.n_name
  }
}
from chain
order by n_nationkey
""",
    """
WITH RECURSIVE chain AS (
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, n.n_name
  FROM chain c, nation n
  WHERE n.n_nationkey = c.n_nationkey + 1 AND n.n_nationkey <= 9
)
SELECT n_nationkey, n_name FROM chain ORDER BY n_nationkey
""",
)

# set ops
q(
    "set_ops",
    """
from customer
where c_acctbal > 9000
select key = c_custkey
concat {
  from supplier
  where s_acctbal > 9000
  select key = s_suppkey
}
group by key
agg n = _.count
order by key
limit 100
""",
    """
SELECT key, count(*) AS n FROM (
  SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT s_suppkey AS key FROM supplier WHERE s_acctbal > 9000
) t
GROUP BY key ORDER BY key LIMIT 100
""",
)

q(
    "intersect_except",
    """
from orders
select k = o_custkey
intersect {
  from customer
  where c_acctbal < 0
  select k = c_custkey
}
except {
  from customer
  where c_acctbal < -900
  select k = c_custkey
}
order by k
""",
    """
SELECT o_custkey AS k FROM orders
INTERSECT
SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
EXCEPT
SELECT c_custkey AS k FROM customer WHERE c_acctbal < -900
ORDER BY k
""",
)

# values / inline tables / dedup / count
q(
    "values_inline",
    """
from [
  [1, 'a'], [2, 'b'], [2, 'b'], [3, 'c'],
] as t(id, tag)
dedup
order by id
""",
    """
SELECT DISTINCT id, tag FROM (VALUES (1, 'a'), (2, 'b'), (2, 'b'), (3, 'c')) t(id, tag)
ORDER BY id
""",
)

q(
    "bare_count",
    """
from lineitem
where l_returnflag = 'R'
count
""",
    """
SELECT count(*) AS count FROM lineitem WHERE l_returnflag = 'R'
""",
)

# pivot (conditional-agg rewrite on both engines)
q(
    "pivot_status",
    """
from orders
pivot on o_orderstatus in ('F', 'O', 'P')
group by o_orderpriority
agg _.count
order by o_orderpriority
""",
    """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# pivot with implicit grouping (`group by *` = every input column not
# referenced by the pivot column / aggregates — the lowering DuckDB's
# PIVOT statement imports onto; round-6 continuation)
q(
    "pivot_group_all",
    """
from orders
select o_orderpriority, o_orderstatus
pivot on o_orderstatus in ('F', 'O', 'P')
group by *
agg _.count
order by o_orderpriority
""",
    """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# unpivot
q(
    "unpivot_part",
    """
from part
where p_partkey <= 50
select p_partkey, size_d = p_size::double, price_d = p_retailprice::double
unpivot metric_value for metric_name in (size_d, price_d)
order by p_partkey, metric_name
""",
    """
SELECT p_partkey, metric_name, metric_value FROM (
  SELECT p_partkey, 'size_d' AS metric_name, CAST(p_size AS DOUBLE) AS metric_value FROM part WHERE p_partkey <= 50
  UNION ALL
  SELECT p_partkey, 'price_d' AS metric_name, CAST(p_retailprice AS DOUBLE) AS metric_value FROM part WHERE p_partkey <= 50
) t
ORDER BY p_partkey, metric_name
""",
)

# asof join (events value as-of each order date, per synthetic key join)
q(
    "asof_join_events",
    """
from events
where event_type = 'purchase' and user_id <= 100
asof join {
  from events
  where event_type = 'view'
  select v_user = user_id, v_ts = ts, v_id = event_id
} on v_user = user_id and v_ts <= ts
select event_id, user_id, ts, v_ts, v_id
order by event_id
""",
    """
SELECT event_id, user_id, ts, v_ts, v_id
FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id <= 100) p
ASOF JOIN (
  SELECT user_id AS v_user, ts AS v_ts, event_id AS v_id
  FROM events WHERE event_type = 'view'
) v ON v.v_user = p.user_id AND v.v_ts <= p.ts
ORDER BY event_id
""",
)

# arrays / structs / 1-origin indexing / lambdas
q(
    "array_ops",
    """
from nation
select
  n_nationkey,
  arr = to_json([n_nationkey, n_regionkey, 42]),
  first_elem = [n_nationkey, n_regionkey][1],
  doubled = to_json(transform([1, 2, 3], x -> x * n_nationkey))
order by n_nationkey
limit 10
""",
    """
SELECT
  n_nationkey,
  to_json([n_nationkey, n_regionkey, 42]) AS arr,
  [n_nationkey, n_regionkey][1] AS first_elem,
  to_json(list_transform([1, 2, 3], x -> x * n_nationkey)) AS doubled
FROM nation
ORDER BY n_nationkey
LIMIT 10
""",
)

# model + partial query composition (language layer)
q(
    "model_composition",
    """
model high_value = {
  from orders
  where o_totalprice > 150000
}
def by_priority = group by o_orderpriority | agg n = _.count, avg_price = (o_totalprice::decimal(18,2).sum::double / _.count)::double

from high_value | by_priority
order by o_orderpriority
""",
    """
SELECT o_orderpriority, count(*) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price
FROM orders
WHERE o_totalprice > 150000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# sample — count-stable reservoir (rows-only oracle: values nondeterministic)
q(
    "sample_reservoir",
    """
from lineitem
sample reservoir(100)
count
""",
    """
SELECT CAST(100 AS BIGINT) AS count
""",
)

# distinct projection
q(
    "select_distinct",
    """
from lineitem
select distinct l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
""",
    """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
)

# is null / null equality sugar / coalesce
q(
    "null_handling",
    """
from customer
left join { from orders where o_totalprice > 300000 } on c_custkey = o_custkey
where o_orderkey = null
select c_custkey, flag = o_orderkey.or_else(-1)
order by c_custkey
""",
    """
SELECT c_custkey, coalesce(o_orderkey, -1) AS flag
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
ON c_custkey = o_custkey
WHERE o_orderkey IS NULL
ORDER BY c_custkey
""",
)

# JSON extraction from string column (events.props)
q(
    "json_extract",
    """
from events
where user_id <= 30
select
  event_id,
  device = json_extract_string(props, '$.device')
order by event_id
limit 200
""",
    """
SELECT event_id, json_extract_string(props, '$.device') AS device
FROM events
WHERE user_id <= 30
ORDER BY event_id
LIMIT 200
""",
)

# step slices (round-6 continuation: l[lo:hi:step] with DuckDB clamping
# semantics — the Spark dialect filters the 1..size position sequence,
# the DuckDB dialect uses 4-arg list_slice)
q(
    "array_step_slice",
    """
from lineitem
where l_orderkey <= 2000
select
  l_orderkey,
  l_linenumber,
  s1 = to_json(array_slice([l_linenumber, l_partkey % 7, l_suppkey % 5, 4, 5, 6], 2, 6, 2)),
  s2 = to_json(array_slice(sequence(1, l_linenumber + 6), -4, -1, 3)),
  s3 = to_json(array_slice([1, 2, 3], -100, 100, 2))
order by l_orderkey, l_linenumber
""",
    """
SELECT l_orderkey, l_linenumber,
  to_json(list_slice([l_linenumber, l_partkey % 7, l_suppkey % 5, 4, 5, 6], 2, 6, 2))::varchar AS s1,
  to_json(list_slice(generate_series(1, l_linenumber + 6), -4, -1, 3))::varchar AS s2,
  to_json(list_slice([1, 2, 3], -100, 100, 2))::varchar AS s3
FROM lineitem
WHERE l_orderkey <= 2000
ORDER BY l_orderkey, l_linenumber
""",
)

# columns_matching (round-6 continuation: schema-expanded regex column
# selection — DuckDB's columns() imports onto this)
q(
    "columns_regex",
    """
from lineitem
where l_orderkey <= 1000
select l_orderkey, l_linenumber, columns_matching('^l_.*(price|disc)')
order by l_orderkey, l_linenumber
""",
    """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
FROM lineitem
WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
""",
)


# ---------------------------------------------------------------------------
# TPC-H remainder (adapted to the slim testdata schema: no partsupp,
# no commitdate/receiptdate/shipmode/container/phone columns; the _like
# variants keep each reference query's operator shape — see
# /root/reference/spec/tpch/q*.wv for the originals)
# ---------------------------------------------------------------------------

q(
    "tpch_q2_like",
    """
from part, lineitem, supplier, nation, region
where p_partkey = l_partkey
  and l_suppkey = s_suppkey
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'EUROPE'
  and p_size <= 5
  and p_type = 'LARGE'
  and l_extendedprice = {
    from lineitem as l2
    where l2.l_partkey = part.p_partkey
    select l2.l_extendedprice.min
  }
select s_acctbal, s_name, n_name, p_partkey, p_brand, l_extendedprice
order by s_acctbal desc, n_name, s_name, p_partkey
limit 100
""",
    """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, l_extendedprice
FROM part, lineitem, supplier, nation, region
WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'EUROPE' AND p_size <= 5 AND p_type = 'LARGE'
  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem AS l2 WHERE l2.l_partkey = part.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)

q(
    "tpch_q7",
    """
from supplier, lineitem, orders, customer, nation as n1, nation as n2
where s_suppkey = l_suppkey
  and o_orderkey = l_orderkey
  and c_custkey = o_custkey
  and s_nationkey = n1.n_nationkey
  and c_nationkey = n2.n_nationkey
  and ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
    or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
  and l_shipdate between '1996-01-01'::date and '1997-12-31'::date
group by supp_nation = n1.n_name, cust_nation = n2.n_name, l_year = extract(year from l_shipdate)
agg revenue = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
order by supp_nation, cust_nation, l_year
""",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM supplier, lineitem, orders, customer, nation AS n1, nation AS n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)

q(
    "tpch_q8_like",
    """
from part, lineitem, orders, customer, supplier, nation as n1, nation as n2, region
where p_partkey = l_partkey
  and l_orderkey = o_orderkey
  and o_custkey = c_custkey
  and l_suppkey = s_suppkey
  and c_nationkey = n1.n_nationkey
  and n1.n_regionkey = r_regionkey
  and s_nationkey = n2.n_nationkey
  and r_name = 'AMERICA'
  and p_type = 'PROMO'
  and o_orderdate between '1996-01-01'::date and '1997-12-31'::date
group by o_year = extract(year from o_orderdate)
agg mkt_share = ((if n2.n_name = 'NATION_3' then l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2)) else 0::decimal(18,2)).sum::double
              / (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double)::double
order by o_year
""",
    """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM part, lineitem, orders, customer, supplier, nation AS n1, nation AS n2, region
WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
  AND s_nationkey = n2.n_nationkey AND r_name = 'AMERICA' AND p_type = 'PROMO'
  AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
GROUP BY 1
ORDER BY 1
""",
)

q(
    "tpch_q9_like",
    """
from lineitem, part, supplier, orders, nation
where l_partkey = p_partkey
  and l_suppkey = s_suppkey
  and l_orderkey = o_orderkey
  and s_nationkey = n_nationkey
  and p_name like '%red%'
group by nation = n_name, o_year = extract(year from o_orderdate)
agg sum_profit = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
order by nation, o_year desc
""",
    """
SELECT n_name AS nation, CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_profit
FROM lineitem, part, supplier, orders, nation
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
  AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
""",
)

q(
    "tpch_q11_like",
    """
from lineitem, supplier, nation
where l_suppkey = s_suppkey
  and s_nationkey = n_nationkey
  and n_name = 'NATION_0'
group by l_partkey
where (l_extendedprice::decimal(18,2)).sum > {
  from lineitem, supplier, nation
  where l_suppkey = s_suppkey
    and s_nationkey = n_nationkey
    and n_name = 'NATION_0'
  select ((l_extendedprice::decimal(18,2)).sum * 0.001::decimal(6,4))
}
agg value = (l_extendedprice::decimal(18,2)).sum::double
order by value desc, l_partkey
""",
    """
SELECT l_partkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_0'
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) > (
  SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) * CAST(0.001 AS DECIMAL(6,4))
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_0'
)
ORDER BY value DESC, l_partkey
""",
)

q(
    "tpch_q12_like",
    """
from orders, lineitem
where o_orderkey = l_orderkey
  and l_returnflag in ('A', 'R')
  and l_shipdate >= '1997-01-01'::date
  and l_shipdate < '1998-01-01'::date
group by l_returnflag
agg
  high_line_count = _.count_if(o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'),
  low_line_count = _.count_if(o_orderpriority != '1-URGENT' and o_orderpriority != '2-HIGH')
order by l_returnflag
""",
    """
SELECT l_returnflag,
       CAST(count_if(o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH') AS BIGINT) AS high_line_count,
       CAST(count_if(o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH') AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey AND l_returnflag IN ('A', 'R')
  AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

q(
    "tpch_q13",
    """
with c_orders as {
  from customer
  left join orders on c_custkey = o_custkey
  group by c_custkey
  agg c_count = o_orderkey.count
}
from c_orders
group by c_count
agg custdist = _.count
order by custdist desc, c_count desc
""",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)

q(
    "tpch_q14",
    """
from lineitem, part
where l_partkey = p_partkey
  and l_shipdate >= '1997-09-01'::date
  and l_shipdate < '1997-10-01'::date
agg promo_revenue = (100.00 * (if p_type = 'PROMO' then l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2)) else 0::decimal(18,2)).sum::double
                   / (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double)::double
""",
    """
SELECT CAST(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey AND l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
""",
)

q(
    "tpch_q15",
    """
with revenue as {
  from lineitem
  where l_shipdate >= '1997-01-01'::date and l_shipdate < '1997-04-01'::date
  group by supplier_no = l_suppkey
  agg total_revenue = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
}
from supplier, revenue
where s_suppkey = supplier_no
  and total_revenue = { from revenue select total_revenue.max }
select s_suppkey, s_name, total_revenue
order by s_suppkey
""",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)

q(
    "tpch_q16_like",
    """
from part, lineitem
where p_partkey = l_partkey
  and p_brand != 'Brand#1'
  and p_type != 'PROMO'
  and p_size in (1, 5, 10, 15, 20, 25, 30, 35)
group by p_brand, p_type, p_size
agg supplier_cnt = _.count_distinct(l_suppkey)
order by supplier_cnt desc, p_brand, p_type, p_size
""",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)

q(
    "tpch_q17_like",
    """
from lineitem, part
where p_partkey = l_partkey
  and p_brand = 'Brand#3'
  and l_quantity < {
    from lineitem as l2
    where l2.l_partkey = part.p_partkey
    select (0.5 * l2.l_quantity.avg)
  }
agg avg_yearly = ((l_extendedprice::decimal(18,2)).sum::double / 7.0)::double
""",
    """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem AS l2 WHERE l2.l_partkey = part.p_partkey)
""",
)

q(
    "tpch_q18",
    """
from customer, orders, lineitem
where o_orderkey in {
  from lineitem
  group by l_orderkey
  where l_quantity.sum > 250
  select l_orderkey
}
  and c_custkey = o_custkey
  and o_orderkey = l_orderkey
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
agg sum_qty = l_quantity::decimal(18,2).sum::double
order by o_totalprice desc, o_orderdate, o_orderkey
limit 100
""",
    """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
)

q(
    "tpch_q19_like",
    """
from lineitem, part
where p_partkey = l_partkey
  and (
    (p_brand = 'Brand#12' and p_size between 1 and 15 and l_quantity >= 1 and l_quantity <= 21)
    or (p_brand = 'Brand#23' and p_size between 1 and 25 and l_quantity >= 10 and l_quantity <= 30)
    or (p_brand = 'Brand#34' and p_size between 1 and 35 and l_quantity >= 20 and l_quantity <= 40)
  )
agg revenue = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
""",
    """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40))
""",
)

q(
    "tpch_q20_like",
    """
from supplier, nation
where s_nationkey = n_nationkey
  and n_name = 'NATION_5'
  and s_suppkey in {
    from lineitem
    where l_shipdate >= '1997-01-01'::date and l_shipdate < '1998-01-01'::date
    group by l_suppkey
    where l_quantity.sum > 100
    select l_suppkey
  }
select s_suppkey, s_name
order by s_name, s_suppkey
""",
    """
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_suppkey HAVING sum(l_quantity) > 100
  )
ORDER BY s_name, s_suppkey
""",
)

q(
    "tpch_q21_like",
    """
from supplier, lineitem as l1, orders, nation
where s_suppkey = l1.l_suppkey
  and o_orderkey = l1.l_orderkey
  and o_orderstatus = 'F'
  and l1.l_returnflag = 'R'
  and exists {
    from lineitem as l2
    where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey != l1.l_suppkey
  }
  and not exists {
    from lineitem as l3
    where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey != l1.l_suppkey
      and l3.l_returnflag = 'R'
  }
  and s_nationkey = n_nationkey
  and n_name = 'NATION_4'
group by s_name
agg numwait = _.count
order by numwait desc, s_name
limit 100
""",
    """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem AS l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem AS l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem AS l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)

q(
    "tpch_q22_like",
    """
from customer
where substring(c_name, 18, 1) in ('1', '2', '3', '4', '5', '6', '7')
  and c_acctbal > {
    from customer as c2
    where c2.c_acctbal > 0.00
      and substring(c2.c_name, 18, 1) in ('1', '2', '3', '4', '5', '6', '7')
    select c2.c_acctbal.avg
  }
  and not exists {
    from orders
    where o_custkey = c_custkey and o_orderpriority = '1-URGENT'
  }
group by cntrycode = substring(c_name, 18, 1)
agg numcust = _.count, totacctbal = c_acctbal::decimal(18,2).sum::double
order by cntrycode
""",
    """
SELECT substring(c_name, 18, 1) AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE substring(c_name, 18, 1) IN ('1', '2', '3', '4', '5', '6', '7')
  AND c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM customer AS c2
    WHERE c2.c_acctbal > 0.00 AND substring(c2.c_name, 18, 1) IN ('1', '2', '3', '4', '5', '6', '7')
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
ORDER BY 1
""",
)

# ---------------------------------------------------------------------------
# flow DSL (SURVEY §2.9) — DAG of stages executed by the FlowExecutor;
# summary relation (stage, state, attempts, error, run_id).  No SQL oracle:
# orchestration state is not expressible as a DuckDB query (driver records
# the weaker rows-only check).
# ---------------------------------------------------------------------------

q(
    "flow_dag_run",
    """
flow suite_archive = {
  stage store = { from orders where o_orderstatus = 'F' count }
}
flow suite_etl = {
  stage extract = { from orders where o_orderstatus = 'F' }
  stage enrich from extract = {
    from extract, customer
    where o_custkey = c_custkey
    group by c_mktsegment
    agg n = _.count
  }
  stage audit if extract.done = { from extract count }
  route enrich {
    case n > 0 -> suite_archive
    else -> end
  }
}
run flow suite_etl
""",
    None,
)

# multi-dimensional grouping (SURVEY §2.4: grouping sets / cube / rollup)
# + unnest lateral expansion (SURVEY §2.3)

q(
    "cube_flags",
    """
from lineitem
group by cube(l_returnflag, l_linestatus)
agg n = _.count
order by l_returnflag nulls last, l_linestatus nulls last
""",
    """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
""",
)

q(
    "grouping_sets_mix",
    """
from orders
group by grouping_sets((o_orderstatus, o_orderpriority), (o_orderstatus))
agg n = _.count
order by o_orderstatus, o_orderpriority nulls last
""",
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), o_orderstatus)
ORDER BY o_orderstatus, o_orderpriority NULLS LAST
""",
)

q(
    "unnest_cross_join",
    """
from nation
cross join unnest([1, 2, 3]) as t(x)
where n_nationkey <= 2
select n_nationkey, n_name, x
order by n_nationkey, x
""",
    """
SELECT n_nationkey, n_name, CAST(x AS BIGINT) AS x
FROM nation CROSS JOIN unnest([1, 2, 3]) AS t(x)
WHERE n_nationkey <= 2
ORDER BY n_nationkey, x
""",
)

# window first/last_value + ntile with full-frame rows[,] (SURVEY §2.5)
# ignore-nulls window modifier (SURVEY §2.5; dialect-split rendering)
# ordered aggregation inside the call (SURVEY §2.4; round-4 language
# surface: `array_agg(x order by k [desc] [nulls first|last])` — DuckDB
# renders natively, Spark composes a null-preserving struct sort)
q(
    "agg_order_by",
    """
from orders
where o_custkey <= 200
group by o_custkey
select
  o_custkey,
  order_keys = to_json(array_agg(o_orderkey order by o_orderdate desc, o_orderkey)),
  statuses = to_json(array_agg(distinct o_orderstatus order by o_orderstatus)),
  priority_list = string_agg(o_orderpriority, '|' order by o_orderkey)
order by o_custkey
""",
    """
SELECT
  o_custkey,
  to_json(array_agg(o_orderkey ORDER BY o_orderdate DESC, o_orderkey)) AS order_keys,
  to_json(array_agg(DISTINCT o_orderstatus ORDER BY o_orderstatus)) AS statuses,
  string_agg(o_orderpriority, '|' ORDER BY o_orderkey) AS priority_list
FROM orders
WHERE o_custkey <= 200
GROUP BY o_custkey
ORDER BY o_custkey
""",
)

# prepared-statement models: PREPARE/EXECUTE lifecycle (SQL import) maps
# to parameterized models; $-params bind at invocation
# (analyzer._expand_model bind_param path)
q(
    "prepared_model_exec",
    """
model big_cust = {
  from customer
  where c_acctbal >= $1 and c_mktsegment = $2
}

from big_cust(5000.0, 'BUILDING')
select c_custkey, c_name, c_acctbal::double as acctbal
order by c_custkey
""",
    """
SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
FROM customer
WHERE c_acctbal >= 5000.0 AND c_mktsegment = 'BUILDING'
ORDER BY c_custkey
""",
)

# LIKE ... ESCAPE (round-4: like_escape/not_like_escape lowering —
# Spark operator form, DuckDB native functions)
q(
    "like_escape_filter",
    """
from part
where p_partkey <= 4000
select p_partkey, masked = replace(p_name, ' ', '_')
where like_escape(masked, '%!_bolt%', '!') and
      !not_like_escape(masked, '%!_%', '!')
order by p_partkey
""",
    """
SELECT p_partkey, replace(p_name, ' ', '_') AS masked
FROM part
WHERE p_partkey <= 4000
  AND replace(p_name, ' ', '_') LIKE '%!_bolt%' ESCAPE '!'
  AND NOT (replace(p_name, ' ', '_') NOT LIKE '%!_%' ESCAPE '!')
ORDER BY p_partkey
""",
)

# ---- round-5: TPC-H shapes NOT yet in the suite (q14's promo share) and
# a correlated NON-EQUI EXISTS (the q4 shape with an inequality on the
# outer row — exercises Catalyst's non-equality decorrelation, which no
# other suite entry covers)

q(
    "exists_non_equi",
    """
from orders
where o_orderdate::date >= '1996-01-01'::date
  and o_orderdate::date < '1996-07-01'::date
  and exists {
    from lineitem
    where l_orderkey = o_orderkey and l_shipdate > o_orderdate
  }
group by o_orderpriority
agg order_count = _.count
order by o_orderpriority
""",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# Q14: promo revenue share over a one-month ship window
# ---------------------------------------------------------------------------
# TPC-DS-shaped entries (round 6): the importer runs 99/99 TPC-DS
# (tests/test_sql_tpcds.py) but the driver gate never saw those SHAPES —
# these re-express the ones the TPC-H suite lacks over the driver's
# tables.  Reference corpus: /root/reference/spec/sql/tpc-ds/.
# ---------------------------------------------------------------------------

# TPC-DS q27/q36 shape: agg over a ROLLUP hierarchy with
# grouping() marking the subtotal level (spec/sql/tpc-ds/q27.sql, q36.sql).
q(
    "tpcds_q27_rollup_grouping",
    """
from customer
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by rollup(r_name, n_name)
agg n = _.count,
    avg_bal = (c_acctbal::decimal(18,2).sum::double / _.count)::double,
    lvl = (grouping(r_name) + grouping(n_name))::long
order by r_name nulls last, n_name nulls last
""",
    """
SELECT r_name, n_name, count(*) AS n,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_bal,
       CAST(grouping(r_name) + grouping(n_name) AS BIGINT) AS lvl
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS LAST, n_name NULLS LAST
""",
)

# TPC-DS q36 shape: ratio-of-sums margin over ROLLUP, then
# RANK() partitioned by the grouping level (spec/sql/tpc-ds/q36.sql).
q(
    "tpcds_q36_margin_rank",
    """
from lineitem
join orders on l_orderkey = o_orderkey
group by rollup(o_orderstatus, l_returnflag)
agg profit = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double,
    charge = (l_extendedprice::decimal(18,2) * (1 + l_tax::decimal(18,2))).sum::double,
    lvl = (grouping(o_orderstatus) + grouping(l_returnflag))::long
add margin = (profit / charge)::double
add rk = rank() over (partition by lvl order by margin desc)
select o_orderstatus, l_returnflag, margin, lvl, rk
order by lvl, rk, o_orderstatus nulls last, l_returnflag nulls last
""",
    """
WITH g AS (
  SELECT o_orderstatus, l_returnflag,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS charge,
         CAST(grouping(o_orderstatus) + grouping(l_returnflag) AS BIGINT) AS lvl
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY ROLLUP (o_orderstatus, l_returnflag)
)
SELECT o_orderstatus, l_returnflag, CAST(profit / charge AS DOUBLE) AS margin, lvl,
       rank() OVER (PARTITION BY lvl ORDER BY profit / charge DESC) AS rk
FROM g
ORDER BY lvl, rk, o_orderstatus NULLS LAST, l_returnflag NULLS LAST
""",
)

# TPC-DS q44 shape: best/worst performers — two opposed
# row_number rankings over one aggregate CTE, joined on rank
# (spec/sql/tpc-ds/q44.sql).
q(
    "tpcds_q44_best_worst",
    """
with perf as {
  from lineitem
  group by l_partkey
  agg avg_qty = (l_quantity::decimal(18,2).sum::double / _.count)::double
}
with best as {
  from perf
  add rk = row_number() over (order by avg_qty desc, l_partkey)
  where rk <= 10
}
with worst as {
  from perf
  add rk = row_number() over (order by avg_qty asc, l_partkey)
  where rk <= 10
}
from best
join worst on best.rk = worst.rk
select rk = best.rk, best_part = best.l_partkey, best_avg = best.avg_qty,
       worst_part = worst.l_partkey, worst_avg = worst.avg_qty
order by rk
""",
    """
WITH perf AS (
  SELECT l_partkey,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey
),
best AS (
  SELECT l_partkey, avg_qty,
         row_number() OVER (ORDER BY avg_qty DESC, l_partkey) AS rk
  FROM perf QUALIFY rk <= 10
),
worst AS (
  SELECT l_partkey, avg_qty,
         row_number() OVER (ORDER BY avg_qty ASC, l_partkey) AS rk
  FROM perf QUALIFY rk <= 10
)
SELECT best.rk AS rk, best.l_partkey AS best_part, best.avg_qty AS best_avg,
       worst.l_partkey AS worst_part, worst.avg_qty AS worst_avg
FROM best JOIN worst ON best.rk = worst.rk
ORDER BY rk
""",
)

# TPC-DS q10 shape: correlated EXISTS chain — one required
# channel AND an OR of two more correlated EXISTS (spec/sql/tpc-ds/q10.sql).
q(
    "tpcds_q10_exists_chain",
    """
from customer
where c_acctbal > 0
  and exists {
    from orders
    where o_custkey = c_custkey
      and o_orderdate >= '1995-01-01'::date and o_orderdate < '1995-07-01'::date
  }
  and (
    exists {
      from orders
      join lineitem on l_orderkey = o_orderkey
      where o_custkey = c_custkey and l_returnflag = 'R'
    }
    or exists {
      from orders
      join lineitem on l_orderkey = o_orderkey
      where o_custkey = c_custkey and l_linestatus = 'O'
    }
  )
group by c_mktsegment
agg n = _.count,
    avg_bal = (c_acctbal::decimal(18,2).sum::double / _.count)::double
order by c_mktsegment
""",
    """
SELECT c_mktsegment, count(*) AS n,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_bal
FROM customer
WHERE c_acctbal > 0
  AND EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01')
  AND (EXISTS (
        SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey = c_custkey AND l_returnflag = 'R')
       OR EXISTS (
        SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey = c_custkey AND l_linestatus = 'O'))
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)

# TPC-DS q14 shape: two-deep INTERSECT stack building the
# cross-channel item set, consumed via IN-subquery (spec/sql/tpc-ds/q14.sql).
q(
    "tpcds_q14_intersect_stack",
    """
with cross_items as {
  from lineitem
  join orders on l_orderkey = o_orderkey
  where o_orderpriority = '1-URGENT'
  select k = l_partkey
  intersect {
    from lineitem
    join orders on l_orderkey = o_orderkey
    where o_orderpriority = '2-HIGH'
    select k = l_partkey
  }
  intersect {
    from lineitem
    join orders on l_orderkey = o_orderkey
    where o_orderpriority = '3-MEDIUM'
    select k = l_partkey
  }
}
from lineitem
where l_partkey in { from cross_items select k }
group by l_returnflag
agg n = _.count, qty = l_quantity::decimal(18,2).sum::double
order by l_returnflag
""",
    """
WITH cross_items AS (
  SELECT l_partkey AS k FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT l_partkey AS k FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '2-HIGH'
  INTERSECT
  SELECT l_partkey AS k FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '3-MEDIUM'
)
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
WHERE l_partkey IN (SELECT k FROM cross_items)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

# TPC-DS q33 shape: per-channel aggregate CTEs unioned and
# re-aggregated to a cross-channel total, top-k (spec/sql/tpc-ds/q33.sql).
q(
    "tpcds_q33_channel_union",
    """
with ch1 as {
  from lineitem
  join orders on l_orderkey = o_orderkey
  where o_orderpriority = '1-URGENT'
  group by l_partkey
  agg rev = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
}
with ch2 as {
  from lineitem
  join orders on l_orderkey = o_orderkey
  where o_orderpriority = '2-HIGH'
  group by l_partkey
  agg rev = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
}
with ch3 as {
  from lineitem
  join orders on l_orderkey = o_orderkey
  where o_orderpriority = '5-LOW'
  group by l_partkey
  agg rev = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
}
from ch1
concat { from ch2 }
concat { from ch3 }
group by l_partkey
agg total = rev.sum::double, channels = _.count
order by total desc, l_partkey
limit 20
""",
    """
WITH ch1 AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '1-URGENT' GROUP BY l_partkey
),
ch2 AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '2-HIGH' GROUP BY l_partkey
),
ch3 AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '5-LOW' GROUP BY l_partkey
)
SELECT l_partkey, CAST(sum(rev) AS DOUBLE) AS total, count(*) AS channels
FROM (SELECT * FROM ch1 UNION ALL SELECT * FROM ch2 UNION ALL SELECT * FROM ch3)
GROUP BY l_partkey
ORDER BY total DESC, l_partkey
LIMIT 20
""",
)

# TPC-DS q67 shape: ROLLUP then rank() partitioned by the
# top-level key, top-3 per partition incl. subtotal rows
# (spec/sql/tpc-ds/q67.sql).
q(
    "tpcds_q67_topk_rollup",
    """
from lineitem
join part on l_partkey = p_partkey
group by rollup(p_brand, p_type)
agg rev = (l_extendedprice::decimal(18,2) * (1 - l_discount::decimal(18,2))).sum::double
add rk = rank() over (partition by p_brand order by rev desc)
where rk <= 3
order by p_brand nulls last, rk, p_type nulls last
""",
    """
WITH g AS (
  SELECT p_brand, p_type,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY ROLLUP (p_brand, p_type)
)
SELECT p_brand, p_type, rev, rk FROM (
  SELECT p_brand, p_type, rev,
         rank() OVER (PARTITION BY p_brand ORDER BY rev DESC) AS rk
  FROM g
) WHERE rk <= 3
ORDER BY p_brand NULLS LAST, rk, p_type NULLS LAST
""",
)
