package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-DS query shapes as EXECUTED oracle rows (promoted from the
  * parse/plan-only RefSqlTpcdsSpec gate; the reference also only
  * parse-tests its spec/sql/tpc-ds corpus — RunnerSpec.scala:137-139).
  *
  * The driver testdata is TPC-H-shaped, so each query runs over a DS star
  * schema DERIVED deterministically from the TPC-H tables inside a shared
  * WITH-prelude: store_sales ← lineitem⋈orders, date_dim ← distinct order
  * dates, item ← part, store ← nation⋈region, and the demographic dims
  * from arithmetic on the customer keys. The prelude plus the query is ONE
  * portable SQL statement executed identically by this engine's SQL
  * front-end AND by the DuckDB oracle — the correctness signal is the DS
  * query SHAPES (multi-CTE, UNION-ALL rollup, decorrelated dims,
  * LIMIT-under-ORDER) over real data, which the empty-view gate could not
  * provide.
  *
  * Adaptations from the canonical corpus (documented per query): constants
  * tuned to the SYNTHETIC testdata's value domains (o_orderdate ∈
  * 1995-2001, single-word p_type categories, Brand#1-25, p_retailprice ∈
  * [900,1000), counties = region names, per-ticket line counts ≤ 7), the
  * `customer` dimension renamed `customer_ds` (a CTE named after the base
  * table would shadow it ambiguously), numeric i_item_id, and double
  * aggregates rounded to 4 dp on both sides per the catalog convention
  * (2 dp sits ON the .005 boundaries of money-valued sums — exact 4-dp
  * multiples — so cross-engine summation-order drift of ~1e-10 flipped a
  * digit; 4 dp boundaries are never multiples of the data's quantum).
  */
object TpcdsQueries {

  import QueryCatalog.Q

  /** The derived DS star schema, prefixed to every query. Every derivation
    * is engine-portable arithmetic (year/month/day, substring, %, CASE) —
    * no engine-specific functions — so Spark SQL and DuckDB compute
    * byte-identical dimensions. Dimension keys are derived from the SAME
    * columns the facts reference (o_custkey ⊆ c_custkey in TPC-H), so
    * every fact key has its dimension row. */
  private val prelude: String = """
WITH date_dim AS (
  SELECT d_date_sk,
         d_date_sk AS d_date,
         year(d_date_sk) AS d_year,
         month(d_date_sk) AS d_moy,
         day(d_date_sk) AS d_dom,
         (year(d_date_sk) - 1992) * 12 + month(d_date_sk) - 1 AS d_month_seq,
         CAST(floor((month(d_date_sk) - 1) / 3.0) AS INTEGER) + 1 AS d_qoy
  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d_date_sk FROM orders) dd
),
item AS (
  SELECT p_partkey AS i_item_sk,
         p_partkey AS i_item_id,
         CAST(substring(p_brand, 7, 2) AS INTEGER) AS i_brand_id,
         p_brand AS i_brand,
         CAST(substring(p_brand, 7, 1) AS INTEGER) AS i_manufact_id,
         substring(p_brand, 1, 7) AS i_manufact,
         p_partkey % 100 AS i_manager_id,
         p_type AS i_category,
         p_size % 10 + 1 AS i_category_id,
         CASE p_size % 7 WHEN 0 THEN 'personal' WHEN 1 THEN 'portable'
              WHEN 2 THEN 'reference' WHEN 3 THEN 'self-help'
              WHEN 4 THEN 'accessories' WHEN 5 THEN 'classical'
              ELSE 'fragrances' END AS i_class,
         p_name AS i_item_desc,
         p_retailprice AS i_current_price
  FROM part
),
store AS (
  SELECT n_nationkey + 1 AS s_store_sk,
         n_name AS s_store_name,
         r_name AS s_county,
         r_name AS s_company_name,
         10 + n_nationkey AS s_number_employees,
         CASE n_nationkey % 3 WHEN 0 THEN 'Fairview' WHEN 1 THEN 'Midway'
              ELSE 'Pleasant Hill' END AS s_city,
         CASE n_nationkey % 5 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'NY'
              WHEN 3 THEN 'TX' ELSE 'WA' END AS s_state,
         CAST(10000 + (n_nationkey * 37) % 89 AS STRING) AS s_zip
  FROM nation JOIN region ON n_regionkey = r_regionkey
),
household_demographics AS (
  SELECT hd_demo_sk,
         hd_demo_sk % 10 AS hd_dep_count,
         hd_demo_sk % 5 AS hd_vehicle_count,
         CASE hd_demo_sk % 4 WHEN 0 THEN '>10000' WHEN 1 THEN 'Unknown'
              WHEN 2 THEN '1001-5000' ELSE '0-500' END AS hd_buy_potential
  FROM (SELECT DISTINCT c_custkey % 720 AS hd_demo_sk FROM customer) hd
),
customer_demographics AS (
  SELECT cd_demo_sk,
         CASE cd_demo_sk % 2 WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE cd_demo_sk % 5 WHEN 0 THEN 'M' WHEN 1 THEN 'S' WHEN 2 THEN 'D'
              WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         CASE cd_demo_sk % 7 WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
              WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree'
              WHEN 4 THEN '4 yr Degree' WHEN 5 THEN 'Advanced Degree'
              ELSE 'Unknown' END AS cd_education_status
  FROM (SELECT DISTINCT c_custkey % 1000 AS cd_demo_sk FROM customer) cd
),
customer_address AS (
  SELECT ca_address_sk,
         CASE ca_address_sk % 3 WHEN 0 THEN 'Fairview' WHEN 1 THEN 'Midway'
              ELSE 'Pleasant Hill' END AS ca_city,
         CASE ca_address_sk % 5 WHEN 0 THEN 'TX' WHEN 1 THEN 'OH' WHEN 2 THEN 'OR'
              WHEN 3 THEN 'NM' ELSE 'KY' END AS ca_state,
         'United States' AS ca_country,
         CAST(10000 + (ca_address_sk * 7) % 89 AS STRING) AS ca_zip
  FROM (SELECT DISTINCT c_custkey % 500 AS ca_address_sk FROM customer) ca
),
customer_ds AS (
  SELECT c_custkey AS c_customer_sk,
         substring(c_name, 10, 9) AS c_last_name,
         c_mktsegment AS c_first_name,
         CASE c_custkey % 6 WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.' WHEN 2 THEN 'Ms.'
              WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Sir' ELSE 'Miss' END AS c_salutation,
         CASE c_custkey % 2 WHEN 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
         c_custkey % 500 AS c_current_addr_sk
  FROM customer
),
promotion AS (
  SELECT p_promo_sk,
         CASE p_promo_sk % 2 WHEN 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
         CASE p_promo_sk % 3 WHEN 0 THEN 'N' ELSE 'Y' END AS p_channel_event
  FROM (SELECT DISTINCT l_partkey % 300 AS p_promo_sk FROM lineitem) pr
),
store_sales AS (
  SELECT CAST(o_orderdate AS DATE) AS ss_sold_date_sk,
         l_partkey AS ss_item_sk,
         o_custkey AS ss_customer_sk,
         o_custkey % 1000 AS ss_cdemo_sk,
         o_custkey % 720 AS ss_hdemo_sk,
         o_orderkey % 500 AS ss_addr_sk,
         l_suppkey % 25 + 1 AS ss_store_sk,
         l_partkey % 300 AS ss_promo_sk,
         l_orderkey AS ss_ticket_number,
         CAST(l_quantity AS INTEGER) AS ss_quantity,
         l_extendedprice / l_quantity AS ss_list_price,
         l_extendedprice * (1 - l_discount) / l_quantity AS ss_sales_price,
         l_extendedprice * (1 - l_discount) AS ss_ext_sales_price,
         l_extendedprice AS ss_ext_list_price,
         l_extendedprice * (1 - l_discount) * l_tax AS ss_ext_tax,
         l_extendedprice * l_discount AS ss_coupon_amt,
         l_extendedprice * 0.6 AS ss_ext_wholesale_cost,
         l_extendedprice * (1 - l_discount) - l_extendedprice * 0.6 AS ss_net_profit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
"""

  private def entry(name: String, sql: String): (String, Q, Option[String]) = {
    val full = prelude + sql
    (name, (spark, dir) => graft.Graft.sqlScript(spark, full, Some(dir)), Some(full))
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    // q3: brand revenue by year for one manufacturer in November
    // (adapted: i_manufact_id 128 → 3; the TPC-H-derived domain is 1-5)
    entry("q_tpcds_q3", """
SELECT dt.d_year,
       item.i_brand_id AS brand_id,
       item.i_brand AS brand,
       round(sum(ss_ext_sales_price) + 5e-9, 4) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 3
  AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, sum_agg DESC, brand_id
LIMIT 100
"""),
    // q7: demographic-and-promotion averages per item
    // (adapted: d_year 2000 → 1995)
    entry("q_tpcds_q7", """
SELECT i_item_id,
       round(avg(ss_quantity) + 5e-9, 4) AS agg1,
       round(avg(ss_list_price) + 5e-9, 4) AS agg2,
       round(avg(ss_coupon_amt) + 5e-9, 4) AS agg3,
       round(avg(ss_sales_price) + 5e-9, 4) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M'
  AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 1995
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
"""),
    // q19: brand revenue where the buyer's zip differs from the store's
    // (adapted: i_manager_id 8, d_year 1998 → 1995, customer → customer_ds)
    entry("q_tpcds_q19", """
SELECT i_brand_id AS brand_id,
       i_brand AS brand,
       i_manufact_id,
       i_manufact,
       round(sum(ss_ext_sales_price) + 5e-9, 4) AS ext_price
FROM date_dim, store_sales, item, customer_ds, customer_address, store
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 8
  AND d_moy = 11
  AND d_year = 1995
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND substring(ca_zip, 1, 5) <> substring(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
LIMIT 100
"""),
    // q27: the corpus' UNION-ALL rollup variant (item×state, item, grand
    // total) over demographic-filtered sales (adapted: d_year 2002 → 1995)
    entry("q_tpcds_q27", """
, results AS (
  SELECT i_item_id, s_state,
         ss_quantity AS agg1, ss_list_price AS agg2,
         ss_coupon_amt AS agg3, ss_sales_price AS agg4
  FROM store_sales, customer_demographics, date_dim, store, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND ss_cdemo_sk = cd_demo_sk
    AND cd_gender = 'M'
    AND cd_marital_status = 'S'
    AND cd_education_status = 'College'
    AND d_year = 1995
    AND s_state = 'TN')
SELECT i_item_id, s_state, g_state, agg1, agg2, agg3, agg4
FROM (
  SELECT i_item_id, s_state, 0 AS g_state,
         round(avg(agg1) + 5e-9, 4) AS agg1, round(avg(agg2) + 5e-9, 4) AS agg2,
         round(avg(agg3) + 5e-9, 4) AS agg3, round(avg(agg4) + 5e-9, 4) AS agg4
  FROM results GROUP BY i_item_id, s_state
  UNION ALL
  SELECT i_item_id, NULL AS s_state, 1 AS g_state,
         round(avg(agg1) + 5e-9, 4) AS agg1, round(avg(agg2) + 5e-9, 4) AS agg2,
         round(avg(agg3) + 5e-9, 4) AS agg3, round(avg(agg4) + 5e-9, 4) AS agg4
  FROM results GROUP BY i_item_id
  UNION ALL
  SELECT NULL AS i_item_id, NULL AS s_state, 1 AS g_state,
         round(avg(agg1) + 5e-9, 4) AS agg1, round(avg(agg2) + 5e-9, 4) AS agg2,
         round(avg(agg3) + 5e-9, 4) AS agg3, round(avg(agg4) + 5e-9, 4) AS agg4
  FROM results) foo
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100
"""),
    // q34: customers making 4-7-line store trips at month start/end
    // (adapted: county = region name 'AMERICA'; cnt 15-20 → 2-7, TPC-H
    // orders have at most 7 lines and the county filter applies per line;
    // customer → customer_ds)
    entry("q_tpcds_q34", """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
    AND (household_demographics.hd_buy_potential = '>10000'
         OR household_demographics.hd_buy_potential = 'Unknown')
    AND household_demographics.hd_vehicle_count > 0
    AND (CASE WHEN household_demographics.hd_vehicle_count > 0
              THEN (household_demographics.hd_dep_count * 1.000)
                   / household_demographics.hd_vehicle_count
              ELSE NULL END) > 1.2
    AND date_dim.d_year IN (1995, 1996, 1997)
    AND store.s_county = 'AMERICA'
  GROUP BY ss_ticket_number, ss_customer_sk) dn, customer_ds
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 2 AND 7
ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
         c_salutation NULLS FIRST, c_preferred_cust_flag DESC NULLS FIRST,
         ss_ticket_number NULLS FIRST
"""),
    // q42: category revenue for one manager's items in November
    // (adapted: d_year 2000 → 1995)
    entry("q_tpcds_q42", """
SELECT dt.d_year,
       item.i_category_id,
       item.i_category,
       round(sum(ss_ext_sales_price) + 5e-9, 4) AS total_sales
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 1995
GROUP BY dt.d_year, item.i_category_id, item.i_category
ORDER BY total_sales DESC, dt.d_year, item.i_category_id, item.i_category
LIMIT 100
"""),
    // q52: brand revenue for one manager's items in November
    // (adapted: d_year 2000 → 1995)
    entry("q_tpcds_q52", """
SELECT dt.d_year,
       item.i_brand_id AS brand_id,
       item.i_brand AS brand,
       round(sum(ss_ext_sales_price) + 5e-9, 4) AS ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 1995
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, ext_price DESC, brand_id
LIMIT 100
"""),
    // q55: brand revenue, manager 28 (adapted: d_year 1999 → 1996)
    entry("q_tpcds_q55", """
SELECT i_brand_id AS brand_id,
       i_brand AS brand,
       round(sum(ss_ext_sales_price) + 5e-9, 4) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 28
  AND d_moy = 11
  AND d_year = 1996
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id
LIMIT 100
"""),
    // q68: trips bought in a different city than the customer's current
    // one (adapted: years 1999-2001 → 1995-1997; customer → customer_ds)
    entry("q_tpcds_q68", """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
FROM (
  SELECT ss_ticket_number, ss_customer_sk,
         ca_city AS bought_city,
         round(sum(ss_ext_sales_price) + 5e-9, 4) AS extended_price,
         round(sum(ss_ext_list_price) + 5e-9, 4) AS list_price,
         round(sum(ss_ext_tax) + 5e-9, 4) AS extended_tax
  FROM store_sales, date_dim, store, household_demographics, customer_address
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND store_sales.ss_addr_sk = customer_address.ca_address_sk
    AND date_dim.d_dom BETWEEN 1 AND 2
    AND (household_demographics.hd_dep_count = 4
         OR household_demographics.hd_vehicle_count = 3)
    AND date_dim.d_year IN (1995, 1996, 1997)
    AND store.s_city IN ('Fairview', 'Midway')
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
  customer_ds, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name NULLS FIRST, ss_ticket_number NULLS FIRST
LIMIT 100
"""),
    // q73: 1-5-line trips by high-buy-potential households (adapted:
    // counties = region names; years → 1995-1997; customer → customer_ds;
    // ticket number added to ORDER BY for a total order)
    entry("q_tpcds_q73", """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND date_dim.d_dom BETWEEN 1 AND 2
    AND (household_demographics.hd_buy_potential = 'Unknown'
         OR household_demographics.hd_buy_potential = '>10000')
    AND household_demographics.hd_vehicle_count > 0
    AND CASE WHEN household_demographics.hd_vehicle_count > 0
             THEN (household_demographics.hd_dep_count * 1.000)
                  / household_demographics.hd_vehicle_count
             ELSE NULL END > 1
    AND date_dim.d_year IN (1995, 1996, 1997)
    AND store.s_county IN ('AMERICA', 'ASIA', 'EUROPE')
  GROUP BY ss_ticket_number, ss_customer_sk) dj, customer_ds
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name ASC, ss_ticket_number ASC
"""),
    // q6: states whose customers buy items priced above 1.2x their
    // category's average, in one month — a correlated scalar subquery over
    // a CTE dimension plus a scalar month-seq subquery (adapted: d_year
    // 2001 -> 1995; price multiplier 1.2 -> 1.02, the synthetic
    // p_retailprice domain is [900,1000) so 1.2x the mean exceeds the max;
    // customer -> customer_ds)
    entry("q_tpcds_q6", """
SELECT a.ca_state AS state,
       count(*) AS cnt
FROM customer_address a, customer_ds c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq =
    (SELECT DISTINCT (d_month_seq) FROM date_dim WHERE d_year = 1995 AND d_moy = 1)
  AND i.i_current_price > 1.02 *
    (SELECT avg(j.i_current_price) FROM item j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING count(*) >= 10
ORDER BY cnt NULLS FIRST, a.ca_state NULLS FIRST
LIMIT 100
"""),
    // q13: demographic x address disjunctive range predicates over one
    // fact scan (adapted: d_year -> 1995, states -> the derived 5-state
    // domain, price/profit bands -> the TPC-H value ranges)
    entry("q_tpcds_q13", """
SELECT round(avg(ss_quantity) + 5e-9, 4) AS avg1,
       round(avg(ss_ext_sales_price) + 5e-9, 4) AS avg2,
       round(avg(ss_ext_wholesale_cost) + 5e-9, 4) AS avg3,
       round(sum(ss_ext_wholesale_cost) + 5e-9, 4) AS sum_wc
FROM store_sales, store, customer_demographics, household_demographics,
     customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_year = 1995
  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 100.00 AND 150.00 AND hd_dep_count = 3)
       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'S' AND cd_education_status = 'College'
           AND ss_sales_price BETWEEN 50.00 AND 100.00 AND hd_dep_count = 1)
       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
           AND ss_sales_price BETWEEN 150.00 AND 200.00 AND hd_dep_count = 1))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TX', 'OH', 'TX') AND ss_net_profit BETWEEN 100 AND 200)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('OR', 'NM', 'KY') AND ss_net_profit BETWEEN 150 AND 300)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('TX', 'OR', 'NM') AND ss_net_profit BETWEEN 50 AND 250))
"""),
    // q36: gross-margin rollup (category -> class -> grand total, the
    // corpus' UNION variant) with rank() within each hierarchy level
    // (adapted: d_year -> 1995; margins rounded at 4dp BEFORE ranking so
    // ties are deterministic; explicit category/class tiebreaks appended
    // to the ORDER BY for a stable LIMIT cut)
    entry("q_tpcds_q36", """
, results AS (
  SELECT sum(ss_net_profit) AS ss_net_profit,
         sum(ss_ext_sales_price) AS ss_ext_sales_price,
         round((sum(ss_net_profit) * 1.0000) / sum(ss_ext_sales_price) + 5e-9, 4) AS gross_margin,
         i_category, i_class,
         0 AS g_category, 0 AS g_class
  FROM store_sales, date_dim d1, item, store
  WHERE d1.d_year = 1995
    AND d1.d_date_sk = ss_sold_date_sk
    AND i_item_sk = ss_item_sk
    AND s_store_sk = ss_store_sk
    AND s_state = 'TN'
  GROUP BY i_category, i_class),
results_rollup AS (
  SELECT gross_margin, i_category, i_class,
         0 AS t_category, 0 AS t_class, 0 AS lochierarchy
  FROM results
  UNION
  SELECT round((sum(ss_net_profit) * 1.0000) / sum(ss_ext_sales_price) + 5e-9, 4) AS gross_margin,
         i_category, NULL AS i_class, 0 AS t_category, 1 AS t_class, 1 AS lochierarchy
  FROM results GROUP BY i_category
  UNION
  SELECT round((sum(ss_net_profit) * 1.0000) / sum(ss_ext_sales_price) + 5e-9, 4) AS gross_margin,
         NULL AS i_category, NULL AS i_class, 1 AS t_category, 1 AS t_class, 2 AS lochierarchy
  FROM results)
SELECT gross_margin, i_category, i_class, lochierarchy,
       rank() OVER (PARTITION BY lochierarchy,
                      CASE WHEN t_class = 0 THEN i_category END
                    ORDER BY gross_margin ASC) AS rank_within_parent
FROM results_rollup
ORDER BY lochierarchy DESC NULLS FIRST,
         CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent NULLS FIRST,
         i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100
"""),
    // q48: one grand-total sum under stacked demographic/address
    // disjunctions (adapted: d_year -> 1995, states/bands as q13)
    entry("q_tpcds_q48", """
SELECT CAST(sum(ss_quantity) AS BIGINT) AS sum_qty
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_year = 1995
  AND ((cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M' AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 100.00 AND 150.00)
       OR (cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'D' AND cd_education_status = '2 yr Degree'
           AND ss_sales_price BETWEEN 50.00 AND 100.00)
       OR (cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'S' AND cd_education_status = 'College'
           AND ss_sales_price BETWEEN 150.00 AND 200.00))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TX', 'OH', 'KY') AND ss_net_profit BETWEEN 0 AND 2000)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('OR', 'NM', 'KY') AND ss_net_profit BETWEEN 150 AND 3000)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('TX', 'OR', 'NM') AND ss_net_profit BETWEEN 50 AND 25000))
"""),
    // q53: manufacturers whose quarterly sales deviate >10% from their own
    // average — an avg-of-sum window over a grouped subquery (adapted:
    // month_seq window -> 1995's seq 36-47; category/class/brand IN lists
    // -> the TPC-H-derived domains)
    entry("q_tpcds_q53", """
SELECT i_manufact_id,
       round(sum_sales + 5e-9, 4) AS sum_sales,
       round(avg_quarterly_sales + 5e-9, 4) AS avg_quarterly_sales
FROM (
  SELECT i_manufact_id,
         sum(ss_sales_price) AS sum_sales,
         avg(sum(ss_sales_price)) OVER (PARTITION BY i_manufact_id) AS avg_quarterly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_month_seq IN (36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47)
    AND ((i_category IN ('STANDARD', 'SMALL', 'PROMO')
          AND i_class IN ('personal', 'portable', 'reference', 'self-help')
          AND i_brand IN ('Brand#1', 'Brand#11', 'Brand#23', 'Brand#14',
                          'Brand#5', 'Brand#17', 'Brand#20', 'Brand#8'))
         OR (i_category IN ('ECONOMY', 'MEDIUM', 'LARGE')
             AND i_class IN ('accessories', 'classical', 'fragrances')
             AND i_brand IN ('Brand#2', 'Brand#12', 'Brand#24', 'Brand#15',
                             'Brand#6', 'Brand#18', 'Brand#21', 'Brand#9')))
  GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
           THEN abs(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
           ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100
"""),
    // q79: per-trip coupon amount and profit for large-household shoppers
    // at mid-size stores (adapted: d_dow -> d_dom = 1, the derived date dim
    // carries no portable day-of-week; employee band -> 15-30 on the
    // nation-derived store dim; customer -> customer_ds)
    entry("q_tpcds_q79", """
SELECT c_last_name, c_first_name,
       substring(s_city, 1, 30) AS city30,
       ss_ticket_number,
       amt, profit
FROM (
  SELECT ss_ticket_number, ss_customer_sk, store.s_city,
         round(sum(ss_coupon_amt) + 5e-9, 4) AS amt,
         round(sum(ss_net_profit) + 5e-9, 4) AS profit
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND (household_demographics.hd_dep_count = 6
         OR household_demographics.hd_vehicle_count > 2)
    AND date_dim.d_dom = 1
    AND date_dim.d_year IN (1995, 1996, 1997)
    AND store.s_number_employees BETWEEN 15 AND 30
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms,
  customer_ds
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
         city30 NULLS FIRST, profit NULLS FIRST, ss_ticket_number
LIMIT 100
"""),
    // q89: store-month sales deviating >10% from the brand-store average —
    // avg-of-sum window partitioned by 4 dims (adapted: d_year -> 1995;
    // category/class IN lists -> derived domains)
    entry("q_tpcds_q89", """
SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
       round(sum_sales + 5e-9, 4) AS sum_sales,
       round(avg_monthly_sales + 5e-9, 4) AS avg_monthly_sales
FROM (
  SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
         sum(ss_sales_price) AS sum_sales,
         avg(sum(ss_sales_price)) OVER (PARTITION BY i_category, i_brand,
           s_store_name, s_company_name) AS avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_year = 1995
    AND ((i_category IN ('STANDARD', 'SMALL', 'PROMO')
          AND i_class IN ('personal', 'portable', 'reference'))
         OR (i_category IN ('ECONOMY', 'MEDIUM', 'LARGE')
             AND i_class IN ('accessories', 'classical', 'fragrances')))
  GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy) tmp1
WHERE CASE WHEN (avg_monthly_sales <> 0)
           THEN (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales)
           ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, s_store_name,
         i_category, i_class, i_brand, s_company_name, d_moy, sum_sales
LIMIT 100
"""),
    // q98: item revenue share within its class over a 30-day window — a
    // sum-over-sum window ratio (adapted: window -> 1995-02-22..1995-03-24;
    // categories -> derived domain; no LIMIT so ordering is cosmetic)
    entry("q_tpcds_q98", """
SELECT i_item_id, i_item_desc, i_category, i_class,
       round(i_current_price + 5e-9, 4) AS i_current_price,
       round(sum(ss_ext_sales_price) + 5e-9, 4) AS itemrevenue,
       round(sum(ss_ext_sales_price) * 100.0000 /
             sum(sum(ss_ext_sales_price)) OVER (PARTITION BY i_class) + 5e-9, 4)
         AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('STANDARD', 'SMALL', 'PROMO')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN CAST('1995-02-22' AS DATE) AND CAST('1995-03-24' AS DATE)
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category NULLS FIRST, i_class NULLS FIRST, i_item_id NULLS FIRST,
         i_item_desc NULLS FIRST, revenueratio NULLS FIRST
""")
  )
}
