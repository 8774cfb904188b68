"""SQL façade: every supported construct compared against DuckDB
executing the SAME string (the strongest possible oracle for a SQL
engine), plus explicit unsupported-construct errors."""

from __future__ import annotations

import pandas as pd
import pytest

from sample_c360_text2sql_segmentation_entityresolution_ray.sql import (
    Catalog,
    SqlUnsupported,
    execute_sql,
)

TABLES = ["customer", "orders", "supplier", "events", "lineitem"]


@pytest.fixture(scope="module")
def catalog(sf_dir):
    cat = Catalog()
    for t in TABLES:
        cat.register_parquet(t, f"{sf_dir}/{t}.parquet")
    return cat


def _check(sql, catalog, duck):
    got = execute_sql(sql, catalog).to_pandas()
    exp = duck.sql(sql).df()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
    e = exp[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)
    return got


CASES = {
    "project_where": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
    """,
    "join_group_having_order_limit": """
        SELECT c.c_name AS name, count(*) AS order_count,
               round(sum(o.o_totalprice), 2) AS total_spend
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY c.c_name HAVING count(*) >= 2
        ORDER BY total_spend DESC, name LIMIT 10
    """,
    "union_all_scalars": """
        SELECT 'c_' || CAST(c_custkey AS VARCHAR) AS pid, lower(c_name) AS nm
        FROM customer WHERE c_custkey IN (1, 2, 3)
        UNION ALL
        SELECT 's_' || CAST(s_suppkey AS VARCHAR), lower(s_name) FROM supplier
    """,
    "regexp_functions": """
        SELECT c_custkey,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
               regexp_replace(c_name, '[0-9]', '#') AS masked_first,
               regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 2) AS digits,
               regexp_extract(c_name, '[0-9]+$') AS tail,
               regexp_matches(c_name, '00') AS has_00
        FROM customer WHERE c_custkey <= 40
    """,
    "case_strftime": """
        SELECT event_id, CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS band,
               strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE value > 95
    """,
    "global_aggregate": """
        SELECT count(*) AS n, round(avg(o_totalprice), 2) AS avg_price FROM orders
    """,
    "left_join": """
        SELECT c.c_custkey AS ck, o.o_orderkey AS ok
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 20
    """,
    "group_multi_agg": """
        SELECT l_returnflag AS flag, min(l_quantity) AS min_q,
               max(l_quantity) AS max_q, round(avg(l_discount), 4) AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    "epoch_roundtrip": """
        SELECT event_id, strftime(to_timestamp(epoch(ts)), '%Y-%m-%d %H:%M:%S') AS t
        FROM events WHERE value > 99
    """,
    "like": """
        SELECT c_custkey AS k FROM customer
        WHERE c_name LIKE '%001%' AND c_name NOT LIKE '%9__'
    """,
    # window functions: two distinct OVER signatures in one select →
    # two partition-hash shuffles; lag with explicit default; tie-safe
    # rank on a low-cardinality order key
    "window_funcs": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               lag(o_totalprice, 1, 0.0)
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev_price,
               rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderstatus) AS status_rank
        FROM orders WHERE o_custkey <= 200
    """,
    "between_distinct": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        WHERE o_totalprice BETWEEN 100000 AND 200000
    """,
    "derived_table": """
        SELECT flag, round(avg(q), 2) AS aq
        FROM (SELECT l_returnflag AS flag, l_quantity AS q
              FROM lineitem WHERE l_discount > 0.05) t
        GROUP BY flag
    """,
    "cte": """
        WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                     WHERE o_totalprice > 150000)
        SELECT c.c_name AS nm, count(*) AS n
        FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_name
    """,
    "in_subquery": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_acctbal > 5000)
          AND o_orderstatus = 'F'
    """,
    # threshold chosen so the result is non-empty at sf0.001 (an empty
    # Dataset loses its schema at to_pandas — known Ray 2.49 limitation)
    "not_in_subquery": """
        SELECT c_custkey AS k FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000)
    """,
    "scalar_subquery": """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
    "exists_subquery": """
        SELECT count(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_totalprice > 400000)
          AND c_acctbal < 0
    """,
    "count_distinct_group": """
        SELECT c_mktsegment AS seg, count(DISTINCT c_nationkey) AS nations,
               count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        FROM customer GROUP BY c_mktsegment
    """,
    "count_distinct_global": """
        SELECT count(DISTINCT o_custkey) AS buyers, count(*) AS orders
        FROM orders
    """,
    "count_distinct_expr": """
        SELECT o_orderstatus AS st,
               count(DISTINCT o_custkey) * 10 AS buyers_x10
        FROM orders GROUP BY o_orderstatus
    """,
    "holistic_aggs_group": """
        SELECT l_returnflag AS f, round(median(l_extendedprice), 2) AS med,
               round(stddev(l_quantity), 6) AS sd,
               round(var_samp(l_extendedprice), 2) AS vs,
               round(stddev_pop(l_quantity), 6) AS sp,
               round(var_pop(l_extendedprice), 2) AS vp,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "stddev_global": """
        SELECT round(stddev(l_quantity), 6) AS sd,
               round(avg(l_quantity), 6) AS m
        FROM lineitem
    """,
    "variance_family_global": """
        SELECT round(stddev_pop(l_quantity), 6) AS sp,
               round(var_samp(l_extendedprice), 1) AS vs,
               round(var_pop(l_quantity), 6) AS vp,
               round(variance(l_discount), 9) AS v
        FROM lineitem
    """,
    "median_with_distinct": """
        SELECT l_linestatus AS s, count(DISTINCT l_suppkey) AS supps,
               round(median(l_quantity), 2) AS medq
        FROM lineitem GROUP BY l_linestatus
    """,
    "aggregate_filter_clause": """
        SELECT o_orderstatus AS st,
               count(*) AS n,
               count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000), 2) AS vol_big,
               count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS whales
        FROM orders GROUP BY o_orderstatus
    """,
    "aggregate_filter_global": """
        SELECT count(*) FILTER (WHERE o_orderstatus = 'O') AS open_n,
               round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_avg
        FROM orders
    """,
    "order_limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 7 OFFSET 5
    """,
    "coalesce_nullif": """
        SELECT c.c_custkey AS k,
               coalesce(o.o_orderkey, -1) AS ok,
               nullif(c.c_mktsegment, 'BUILDING') AS seg
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 30
    """,
    "date_parts_substr": """
        SELECT event_id, date_trunc('day', ts) AS d,
               date_trunc('month', ts) AS mo, date_trunc('week', ts) AS wk,
               year(ts) AS y, month(ts) AS m, day(ts) AS dd,
               substr(event_type, 1, 3) AS pre
        FROM events WHERE value > 97
    """,
    "string_functions": """
        SELECT c_custkey,
               replace(c_name, '0', '_') AS rep,
               contains(c_name, '00') AS has00,
               starts_with(c_name, 'Customer') AS pre,
               ends_with(c_name, '1') AS suf,
               split_part(c_name, '#', 2) AS num_part,
               left(c_name, 4) AS l4, right(c_name, 3) AS r3,
               left(c_name, -2) AS lneg, right(c_name, -2) AS rneg,
               reverse(c_name) AS rev, repeat(c_mktsegment, 2) AS rep2,
               lpad(c_mktsegment, 12, '*') AS lp,
               rpad(c_mktsegment, 4, 'xy') AS rp,
               ltrim(concat(' ', c_name)) AS lt, rtrim(concat(c_name, ' ')) AS rt
        FROM customer WHERE c_custkey <= 40
    """,
    "math_functions": """
        SELECT o_orderkey,
               floor(o_totalprice) AS fl, ceil(o_totalprice) AS ce,
               round(sqrt(o_totalprice), 6) AS sq,
               round(ln(o_totalprice), 6) AS lnp,
               round(log(o_totalprice), 6) AS lg10,
               round(log2(o_totalprice), 6) AS lg2,
               round(exp(o_totalprice / 100000), 6) AS ex,
               round(pow(o_totalprice, 0.25), 6) AS pw,
               sign(o_totalprice - 100000) AS sg
        FROM orders WHERE o_orderkey <= 400
    """,
    "setops_chain": """
        (SELECT c_mktsegment AS seg FROM customer WHERE c_custkey <= 75
         INTERSECT
         SELECT c_mktsegment FROM customer WHERE c_custkey > 75)
        EXCEPT
        SELECT c_mktsegment FROM customer WHERE c_mktsegment = 'FURNITURE'
        UNION
        SELECT upper(o_orderstatus) FROM orders
    """,
    "union_distinct": """
        SELECT c_mktsegment AS seg FROM customer
        UNION SELECT o_orderstatus FROM orders
    """,
    "right_outer_join": """
        SELECT o.o_orderkey AS ord, c.c_custkey AS ck, c.c_mktsegment AS seg
        FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey <= 60
    """,
    "full_outer_join_coalesced": """
        SELECT CAST(coalesce(a.c_custkey, -1) AS BIGINT) AS ak,
               CAST(coalesce(b.o_custkey, -1) AS BIGINT) AS bk,
               CAST(coalesce(b.n_orders, 0) AS BIGINT) AS n_orders
        FROM (SELECT c_custkey FROM customer WHERE c_custkey < 50) a
        FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
                   WHERE o_custkey >= 25 AND o_custkey < 75
                   GROUP BY o_custkey) b
        ON a.c_custkey = b.o_custkey
    """,
    "rollup": """
        SELECT l_returnflag AS flag, l_linestatus AS status,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_with_having": """
        SELECT l_returnflag AS flag, l_linestatus AS status, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        HAVING count(*) >= 100
    """,
    "grouping_sets": """
        SELECT l_returnflag AS flag, l_linestatus AS status, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "window_rolling_cum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice)
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey), 4) AS cum_spend,
               round(avg(o_totalprice)
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS r3
        FROM orders WHERE o_custkey <= 200
    """,
    # ORDER BY expressions / ordinals / aliases (SQL sees the INPUT scope)
    "order_by_input_expr": """
        SELECT o_orderkey FROM orders
        ORDER BY o_totalprice * 2 DESC, o_orderkey LIMIT 5
    """,
    "order_by_ordinals": """
        SELECT o_orderstatus, count(*) AS c FROM orders
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 2
    """,
    "order_by_aggregate_expr": """
        SELECT o_custkey, round(sum(o_totalprice), 2) AS s FROM orders
        GROUP BY o_custkey
        ORDER BY sum(o_totalprice) / count(*) DESC, o_custkey LIMIT 5
    """,
    "order_by_alias_expr": """
        SELECT o_orderkey, o_totalprice * 0.5 AS half FROM orders
        ORDER BY half DESC, o_orderkey LIMIT 5
    """,
    "group_by_alias_and_having_alias": """
        SELECT upper(o_orderstatus) AS st, count(*) AS c FROM orders
        GROUP BY st HAVING c > 10
    """,
    # ILIKE / ESCAPE / variadic comparisons / concat_ws
    "ilike_escape": """
        SELECT c_custkey FROM customer
        WHERE c_name ILIKE '%customer%' AND c_name NOT LIKE '%x#_%' ESCAPE '#'
        ORDER BY c_custkey LIMIT 5
    """,
    "greatest_least_concat_ws": """
        SELECT o_orderkey, greatest(o_totalprice, 150000.0) AS g,
               least(o_custkey, 500) AS l,
               concat_ws('-', o_orderstatus, CAST(o_custkey AS VARCHAR)) AS tag
        FROM orders ORDER BY o_orderkey LIMIT 5
    """,
    # extract/date_part, integer division, INTERVAL arithmetic
    "extract_and_int_div": """
        SELECT extract('year' FROM o_orderdate) AS y,
               date_part('quarter', o_orderdate) AS q,
               o_orderkey // 1000 AS kb, count(*) AS c
        FROM orders GROUP BY y, q, kb
    """,
    "interval_arithmetic": """
        SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS d30,
               o_orderdate - INTERVAL 2 HOUR AS h2
        FROM orders ORDER BY o_orderkey LIMIT 5
    """,
    # join-shape coverage: CROSS, comma joins (WHERE equalities hoisted
    # into the join), USING/NATURAL, non-equality ON residue
    "cross_join": """
        SELECT s_name, e.user_id AS u
        FROM supplier CROSS JOIN (SELECT DISTINCT user_id FROM events
                                  WHERE user_id <= 3) e
    """,
    "comma_join_where_equalities": """
        SELECT c_name, count(*) AS c FROM orders, customer
        WHERE o_custkey = c_custkey AND o_totalprice > 100000
        GROUP BY c_name
    """,
    "using_join": """
        SELECT c FROM (SELECT o_custkey AS k, o_totalprice FROM orders) o
        JOIN (SELECT c_custkey AS k, count(*) AS c FROM customer GROUP BY k) c
        USING (k) ORDER BY o_totalprice DESC, c LIMIT 3
    """,
    "natural_join": """
        SELECT count(*) AS c FROM (SELECT o_custkey AS k FROM orders) o
        NATURAL JOIN (SELECT c_custkey AS k FROM customer WHERE c_custkey < 100) c
    """,
    "nonequi_join_residue": """
        SELECT c.c_custkey, count(*) AS c FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
                     AND o.o_totalprice > c.c_acctbal
        GROUP BY c.c_custkey
    """,
    "pure_inequality_join": """
        SELECT count(*) AS c
        FROM (SELECT DISTINCT user_id AS a FROM events WHERE user_id <= 10) x
        JOIN (SELECT DISTINCT user_id AS b FROM events WHERE user_id <= 10) y
        ON y.b > x.a
    """,
    # aggregate surface: boolean aggregates, DISTINCT aggregates,
    # ORDER-BY-inside string_agg
    "bool_aggregates": """
        SELECT o_custkey, bool_or(o_totalprice > 200000) AS any_big,
               bool_and(o_orderstatus = 'O') AS all_open
        FROM orders GROUP BY o_custkey
    """,
    "bool_aggregates_global": """
        SELECT bool_or(o_totalprice > 400000) AS b1,
               bool_and(o_totalprice > 0) AS b2 FROM orders
    """,
    "distinct_aggregates": """
        SELECT o_orderstatus, CAST(sum(DISTINCT o_custkey) AS DOUBLE) AS sd,
               round(avg(DISTINCT o_custkey), 6) AS ad,
               count(DISTINCT o_custkey) AS cd,
               min(DISTINCT o_totalprice) AS mn
        FROM orders GROUP BY o_orderstatus
    """,
    "distinct_aggregates_global": """
        SELECT CAST(sum(DISTINCT o_custkey) AS DOUBLE) AS s,
               round(avg(DISTINCT o_custkey), 6) AS a FROM orders
    """,
    "string_agg_ordered": """
        SELECT o_custkey % 10 AS bucket,
               string_agg(o_orderstatus, '' ORDER BY o_orderkey) AS seq
        FROM orders WHERE o_custkey <= 50 GROUP BY bucket
    """,
    # global window (OVER with ORDER BY only): one total order — the
    # single-partition plan SQL's semantics force; for ranked reports
    "global_window": """
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               rank() OVER (ORDER BY o_orderstatus) AS rk
        FROM orders WHERE o_custkey <= 100 ORDER BY rn LIMIT 10
    """,
    # full-partition window aggregates (the "pct of total" idiom) and
    # QUALIFY filtering on window results
    "partition_window_aggregates": """
        SELECT o_orderkey,
               round(o_totalprice / sum(o_totalprice)
                     OVER (PARTITION BY o_custkey), 8) AS frac,
               count(*) OVER (PARTITION BY o_custkey) AS n,
               min(o_totalprice) OVER (PARTITION BY o_custkey) AS m,
               count(*) OVER () AS total_n
        FROM orders WHERE o_custkey <= 100
    """,
    "window_unbounded_both": """
        SELECT o_orderkey,
               max(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING) AS mx
        FROM orders WHERE o_custkey <= 100
    """,
    "qualify_alias": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders QUALIFY rn = 1
    """,
    "qualify_direct": """
        SELECT o_custkey, o_orderkey FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) <= 2
    """,
    # correlated subqueries — decorrelated to semi/anti joins (EXISTS)
    # and grouped-aggregate left joins (scalar aggregates)
    "correlated_exists": """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
    "correlated_not_exists": """
        SELECT count(*) AS n FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
    """,
    "correlated_exists_two_keys": """
        SELECT count(*) AS n FROM orders a
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = a.o_orderkey
                        AND l.l_linestatus = a.o_orderstatus)
    """,
    "correlated_scalar_select": """
        SELECT c_custkey,
               (SELECT max(o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS m,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n
        FROM customer c WHERE c_custkey <= 50 ORDER BY c_custkey
    """,
    "correlated_scalar_where": """
        SELECT c_custkey FROM customer c
        WHERE c_acctbal * 50 > (SELECT max(o_totalprice) FROM orders o
                                WHERE o.o_custkey = c.c_custkey)
    """,
    # first two subqueries share source + correlation key → fused into
    # ONE grouped aggregate + ONE join; the third has a different
    # residual WHERE so it must stay its own group (engine.py fusion)
    "correlated_scalar_fusion_mixed": """
        SELECT c_custkey,
               (SELECT max(o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_spend,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F') AS n_closed
        FROM customer c WHERE c_custkey <= 80 ORDER BY c_custkey
    """,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_sql_matches_duckdb(name, catalog, duck):
    _check(CASES[name], catalog, duck)


def test_prunes_columns_at_read(catalog):
    ds = execute_sql("SELECT o_orderkey AS k FROM orders", catalog)
    # the physical read must only carry the referenced column
    assert ds.to_pandas().columns.tolist() == ["k"]


def test_distinct_on(catalog, duck):
    """DISTINCT ON keeps the first row per key group by the ORDER BY —
    order-sensitive because of the LIMIT, so compare positionally."""
    sql = """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        LIMIT 20
    """
    got = execute_sql(sql, catalog).to_pandas().reset_index(drop=True)
    exp = duck.sql(sql).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_array_agg_ordered(catalog, duck):
    """array_agg returns lists — compared element-wise (the engine
    yields Python lists, DuckDB numpy arrays)."""
    sql = """
        SELECT o_custkey AS k, array_agg(o_orderkey ORDER BY o_orderkey) AS ks
        FROM orders WHERE o_custkey <= 100 GROUP BY k
    """
    got = execute_sql(sql, catalog).to_pandas().sort_values("k").reset_index(drop=True)
    exp = duck.sql(sql).df().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    assert [list(x) for x in got["ks"]] == [list(x) for x in exp["ks"]]


def test_nulls_first_ordering(catalog, duck):
    """NULLS FIRST is order semantics — compare positionally, not
    canonicalized (both engines default to NULLS LAST otherwise)."""
    sql = """
        SELECT nullif(o_orderstatus, 'O') AS st, o_orderkey FROM orders
        ORDER BY st NULLS FIRST, o_orderkey LIMIT 8
    """
    got = execute_sql(sql, catalog).to_pandas()
    exp = duck.sql(sql).df()
    assert got["st"].isna().tolist() == exp["st"].isna().tolist()
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()


def test_unsupported_raises(catalog):
    with pytest.raises(SqlUnsupported):
        execute_sql(
            "SELECT median(o_totalprice) AS m FROM orders", catalog
        )
    with pytest.raises(SqlUnsupported):
        # an order-DEPENDENT window with no ORDER BY has no defined
        # result (full-partition aggregates like sum OVER (PARTITION BY)
        # are the supported order-free shape)
        execute_sql(
            "SELECT o_orderkey, lag(o_totalprice)"
            " OVER (PARTITION BY o_custkey) AS p FROM orders",
            catalog,
        )
    with pytest.raises(SqlUnsupported):
        # outer joins cannot take non-equality ON residue (ON controls
        # null-extension; a post-join filter can't reproduce it)
        execute_sql(
            "SELECT c_name AS n FROM orders o LEFT JOIN customer c "
            "ON o.o_custkey = c.c_custkey AND o.o_totalprice < c.c_acctbal",
            catalog,
        )
    with pytest.raises(SqlUnsupported):
        # INEQUALITY correlation has no decorrelated join form → rejected
        # (equality-correlated EXISTS/scalar aggregates are supported)
        execute_sql(
            "SELECT count(*) AS n FROM orders a WHERE EXISTS "
            "(SELECT 1 FROM orders b WHERE b.o_custkey = a.o_custkey "
            " AND b.o_totalprice > a.o_totalprice)",
            catalog,
        )


def test_outer_join_null_semantics(catalog, duck):
    """Raw (uncoalesced) FULL JOIN: both key columns must null-extend —
    the shadow-key exchange must not let pyarrow coalesce them."""
    sql = """
        SELECT a.c_custkey AS ak, b.k2 AS bk
        FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 20) a
        FULL JOIN (SELECT c_custkey AS k2 FROM customer
                   WHERE c_custkey BETWEEN 11 AND 30) b
        ON a.c_custkey = b.k2
    """
    got = execute_sql(sql, catalog).to_pandas()
    exp = duck.sql(sql).df()
    cols = ["ak", "bk"]
    g = got[cols].astype("float64").sort_values(cols).reset_index(drop=True)
    e = exp[cols].astype("float64").sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_setop_empty_branch_and_guards(catalog):
    # a legitimately-empty branch compiles (names from the AST) and
    # leaves the other side's distinct rows (EXCEPT) intact
    out = execute_sql(
        """SELECT c_mktsegment AS seg FROM customer
           EXCEPT SELECT c_mktsegment FROM customer WHERE c_custkey > 999999""",
        catalog,
    ).to_pandas()
    assert len(out) == 5 and list(out.columns) == ["seg"]
    with pytest.raises(SqlUnsupported):  # bag semantics not supported
        execute_sql(
            "SELECT c_custkey FROM customer EXCEPT ALL "
            "SELECT o_custkey FROM orders",
            catalog,
        )
    with pytest.raises(SqlUnsupported):  # ambiguous outer-join columns
        execute_sql(
            "SELECT 1 AS x FROM (SELECT c_custkey FROM customer) a "
            "FULL JOIN (SELECT c_custkey FROM customer) b "
            "ON a.c_custkey = b.c_custkey",
            catalog,
        )


def test_from_unixtime_helper(catalog, duck):
    # the reference's Athena epoch-seconds idiom: from_unixtime on our
    # side, to_timestamp (the DuckDB spelling) on the oracle side
    got = execute_sql(
        "SELECT event_id, strftime(from_unixtime(epoch(ts)), '%Y-%m-%d') AS d "
        "FROM events WHERE value > 99",
        catalog,
    ).to_pandas()
    exp = duck.sql(
        "SELECT event_id, strftime(to_timestamp(epoch(ts)), '%Y-%m-%d') AS d "
        "FROM events WHERE value > 99"
    ).df()
    cols = ["event_id", "d"]
    pd.testing.assert_frame_equal(
        got[cols].astype(str).sort_values(cols).reset_index(drop=True),
        exp[cols].astype(str).sort_values(cols).reset_index(drop=True),
    )


def test_star_join_chain_stays_broadcast(catalog, duck, sf_dir):
    """fact ⋈ dim ⋈ dim: both dims have known-small parquet row counts,
    so the whole chain compiles to broadcast probes — no shuffle-join
    operator anywhere in the executed plan."""
    cat = Catalog()
    for t in ["orders", "customer", "nation"]:
        cat.register_parquet(t, f"{sf_dir}/{t}.parquet")
    sql = """
        SELECT n.n_name AS nation, count(*) AS orders_n,
               round(sum(o.o_totalprice), 2) AS vol
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """
    ds = execute_sql(sql, cat)
    got = ds.to_pandas()
    exp = duck.sql(sql).df()
    cols = sorted(got.columns)
    g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
    e = exp[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)
    assert "Join(" not in ds.stats(), "star chain fell back to a shuffle join"


def test_grouped_aggregate_hot_key(ray_session):
    """A single key owning ~all rows must still aggregate exactly —
    the combiner ships one partial per block, not the rows."""
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        grouped_aggregate,
    )

    n = 50_000
    df = pd.DataFrame(
        {
            "k": ["hot"] * (n - 3) + ["a", "b", "c"],
            "v": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(16)
    out = (
        grouped_aggregate(
            ds,
            ["k"],
            [("count_star", None, "n"), ("sum", "v", "s"), ("max", "v", "mx")],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k")
        .agg(n=("v", "size"), s=("v", "sum"), mx=("v", "max"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
