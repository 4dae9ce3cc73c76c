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
  * tuned to the TPC-H value domains (d_year ∈ 1992-1998, i_manufact_id ∈
  * 1-5, counties = region names, per-ticket line counts ≤ 7), the
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
         year(d_date_sk) AS d_year,
         month(d_date_sk) AS d_moy,
         day(d_date_sk) AS d_dom
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
         p_size % 10 + 1 AS i_category_id
  FROM part
),
store AS (
  SELECT n_nationkey + 1 AS s_store_sk,
         n_name AS s_store_name,
         r_name AS s_county,
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
         l_extendedprice * l_discount AS ss_coupon_amt
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
       round(sum(ss_ext_sales_price), 4) AS sum_agg
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
       round(sum(ss_ext_sales_price), 4) AS ext_price
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
       round(sum(ss_ext_sales_price), 4) AS total_sales
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
       round(sum(ss_ext_sales_price), 4) AS ext_price
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
       round(sum(ss_ext_sales_price), 4) AS ext_price
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
         round(sum(ss_ext_sales_price), 4) AS extended_price,
         round(sum(ss_ext_list_price), 4) AS list_price,
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
""")
  )
}
