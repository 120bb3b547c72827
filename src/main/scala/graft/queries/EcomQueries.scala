package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.ecom.EcomFixture

/** Model-parity pack: one oracle-checked query per dbt model in the
  * reference's medallion pipeline (ecom_intermediate + ecom_marts — the
  * VERDICT r3 "15 missing models" plus the previously spec-only ones).
  *
  * Each `ecom_<model>` key materializes the FULL raw→staging→intermediate→
  * marts DAG via [[graft.plans.ModelGraph.run]] over the deterministic
  * TPC-H-derived fixture ([[graft.ecom.EcomFixture]]) and returns that
  * model's rows. The DuckDB oracle replays the identical derivation as a
  * WITH-chain ([[stagePrefix]]) and the model's reference SQL on top — so a
  * green row is an end-to-end medallion proof, not a unit check.
  *
  * Type normalization rule (driver compare): DECIMAL outputs are cast to
  * DOUBLE on both sides (exact decimal → nearest double is engine-portable;
  * see F.moneySum), and DuckDB integer-SUMs (HUGEINT) are cast to BIGINT to
  * match Spark's LongType.
  */
object EcomQueries {

  private type Q = (SparkSession, String) => DataFrame

  /** Decimal→double and timestamp→NTZ on every column (the repo's output
    * portability rules: F.moneySum doc; NTZ so parquet timestamps read back
    * naive, matching DuckDB's), then a deterministic total order. */
  private def normalized(df: DataFrame, order: Seq[String]): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case TimestampType => col(f.name).cast("timestamp_ntz").as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*).orderBy(order.map(col): _*)

  private def model(name: String, order: String*): Q =
    (s, dir) => normalized(EcomFixture.marts(s, dir)(name), order)

  /** The ⚠ quirk as a checkable fact: comma-less addresses ⇒ `addresses`
    * empty and both order address FKs all-NULL (entities/addresses.sql:28-33,
    * SURVEY §2.8 ⚠). */
  private val addressesQuirk: Q = (s, dir) => {
    val m = EcomFixture.marts(s, dir)
    m("addresses").agg(count(lit(1)).as("n_addresses"))
      .crossJoin(m("orders").agg(
        count(col("shipping_address_id")).as("n_shipping_fk"),
        count(col("billing_address_id")).as("n_billing_fk")))
  }

  /** The reference's full declared schema.yml test matrix (150 tests) as
    * one result frame — see [[graft.ecom.EcomSchemaTests]]. Source-tier
    * checks run against the raw frames (column names lowered; the raw
    * fixture is uppercase like the warehouse it models). Cached per
    * (session, dir): the frame plans over one-time parquet spills, so
    * repeated bench passes rescan instead of re-spilling 40 tables. */
  private val qaCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Boolean), DataFrame]
  private def srcTables(s: SparkSession, dir: String): Map[String, DataFrame] =
    EcomFixture.raw(s, dir).map { case (k, v) =>
      ("src_" + k.stripPrefix("raw_")) ->
        v.toDF(v.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
    }
  private def modelNames(prefix: String): Set[String] =
    graft.ecom.Ecom.models(EcomFixture.now, EcomFixture.today)
      .map(_.name).filter(_.startsWith(prefix)).toSet
  // The src_* AND stg_* tiers are STREAMED through the fused branches,
  // not pre-materialized: both are pure cast-projections over raw parquet
  // (staging's 1:1 row-preservation is spec-pinned — it is the qa
  // oracle's premise), so streaming reads only the checked columns
  // (pruned scans) where the old full-width parquet copies rewrote ~the
  // whole input per run — at skew100 those copies alone were
  // ~input-sized disk. <= 5 fused scans per streamed table (its one fused
  // check branch + Rel-parent reads). The dim_* Views still pre-materialize:
  // they are genuine multi-join derivations read as Rel parents up to 5x,
  // and they are small relative to the inputs.
  private val qaSchemaTests: Q = (s, dir) =>
    qaCache.getOrElseUpdate((s, dir, false), {
      val src = srcTables(s, dir)
      graft.ecom.EcomSchemaTests.frame(
        s, src ++ EcomFixture.marts(s, dir),
        stream = src.keySet ++ modelNames("stg_"))
    })
  /** The landing-governed twin the [[EcomFixture]] fence names: interior
    * models land, the leaf fct_* marts stream through their checks as
    * derived plans over the landed interior. Identical output frame —
    * same oracle SQL. */
  private val qaSchemaTestsStream: Q = (s, dir) =>
    qaCache.getOrElseUpdate((s, dir, true), {
      val src = srcTables(s, dir)
      graft.ecom.EcomSchemaTests.frame(
        s, src ++ EcomFixture.martsStreamed(s, dir),
        stream = src.keySet ++ modelNames("stg_") ++ modelNames("fct_"))
    })

  def queries: Map[String, Q] = Map(
    "qa_schema_tests" -> qaSchemaTests,
    "qa_schema_tests_stream" -> qaSchemaTestsStream,
    "ecom_locations" -> model("locations", "location_id"),
    "ecom_addresses_quirk" -> addressesQuirk,
    "ecom_customers_enriched" -> model("customers_enriched", "customer_id"),
    "ecom_products_enriched" -> model("products_enriched", "product_id"),
    "ecom_orders" -> model("orders", "order_id"),
    "ecom_order_items" -> model("order_items", "order_item_id"),
    "ecom_categories_enriched" -> model("categories_enriched", "category_id"),
    "ecom_subcategories_enriched" -> model("subcategories_enriched", "subcategory_id"),
    "ecom_reviews_enriched" -> model("reviews_enriched", "review_id"),
    "ecom_customer_interactions" -> model("customer_interactions", "event_id"),
    "ecom_dim_customers" -> model("dim_customers", "customer_id"),
    "ecom_dim_products" -> model("dim_products", "product_id"),
    "ecom_dim_categories" -> model("dim_categories", "category_id"),
    "ecom_dim_locations" -> model("dim_locations", "location_id"),
    "ecom_dim_dates" -> model("dim_dates", "date_day"),
    "ecom_fct_sales_by_date" -> model("fct_sales_by_date", "sale_date"),
    "ecom_fct_customer_orders" -> model("fct_customer_orders", "order_id"),
    "ecom_fct_customer_activity" -> model("fct_customer_activity", "customer_id", "activity_month"),
    "ecom_fct_customer_reviews" -> model("fct_customer_reviews",
      "customer_id", "product_id", "order_id", "review_score", "review_text"),
    "ecom_fct_order_details" -> model("fct_order_details",
      "order_id", "product_id", "quantity", "unit_price", "item_total", "review_score"),
    "ecom_fct_product_performance" -> model("fct_product_performance", "product_id", "month"),
    "ecom_fct_product_interactions" -> model("fct_product_interactions", "product_id", "event_day"),
    "ecom_fct_sales_by_product" -> model("fct_sales_by_product", "product_id", "sales_month"),
    "ecom_fct_sales_by_region" -> model("fct_sales_by_region", "state", "country", "sales_month")
  )

  // ------------------------------------------------------------- oracle --
  // The DuckDB WITH-chain replaying EcomFixture.raw + Ecom staging/
  // intermediate models verbatim. Marts are appended per query.

  private val NOW = "TIMESTAMP '1998-06-01 00:00:00'"

  /** dbt_utils.generate_surrogate_key expansion (mirrors F.surrogateKey). */
  private def sk(cols: String*): String =
    cols.map(c => s"COALESCE(CAST($c AS VARCHAR), '_dbt_utils_surrogate_key_null_')")
      .mkString("md5(concat_ws('-', ", ", ", "))")

  private val stagePrefix: String = s"""WITH stg_customers AS (
  SELECT 'C' || CAST(c_custkey AS VARCHAR) AS customer_id,
         'c' || CAST(c_custkey AS VARCHAR) || '@shop.io' AS email,
         'F' || CAST(c_custkey % 97 AS VARCHAR) AS first_name,
         'L' || CAST(c_custkey % 89 AS VARCHAR) AS last_name,
         CAST(18 + c_custkey % 60 AS INT) AS age,
         CASE WHEN c_custkey % 3 = 0 THEN 'F' WHEN c_custkey % 3 = 1 THEN 'M' ELSE 'Other' END AS gender,
         CAST(c_acctbal AS DECIMAL(12,2)) AS annual_income,
         CASE WHEN c_custkey % 4 = 0 THEN 'Single' WHEN c_custkey % 4 = 1 THEN 'Married'
              WHEN c_custkey % 4 = 2 THEN 'Divorced' ELSE 'Widowed' END AS marital_status,
         CASE WHEN c_custkey % 5 = 0 THEN 'High School' WHEN c_custkey % 5 = 1 THEN 'Bachelor'
              WHEN c_custkey % 5 = 2 THEN 'Master' WHEN c_custkey % 5 = 3 THEN 'PhD'
              ELSE 'Associate' END AS education,
         CASE WHEN c_custkey % 3 = 0 THEN 'Urban' WHEN c_custkey % 3 = 1 THEN 'Suburban' ELSE 'Rural' END AS location_type,
         CASE WHEN c_custkey % 41 = 0 THEN '  ' ELSE 'City ' || CAST(c_custkey % 37 AS VARCHAR) END AS city,
         'ST' || CAST(c_custkey % 11 AS VARCHAR) AS state,
         n_name AS country,
         CAST(DATE '1995-01-01' + CAST(c_custkey % 730 AS INT) AS TIMESTAMP) AS signup_date,
         CAST(DATE '1997-06-01' + CAST(c_custkey % 365 AS INT) AS TIMESTAMP) AS last_login,
         CASE WHEN c_custkey % 3 = 0 THEN 'Web' WHEN c_custkey % 3 = 1 THEN 'Mobile App' ELSE 'Email' END AS preferred_channel,
         c_custkey % 5 <> 0 AS is_active,
         $NOW AS loaded_at
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
stg_orders AS (
  SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS order_id,
         'C' || CAST(o_custkey AS VARCHAR) AS customer_id,
         o_orderdate AS order_date,
         CASE WHEN o_orderstatus = 'O' THEN 'Pending' WHEN o_orderstatus = 'F' THEN 'Delivered' ELSE 'Shipped' END AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) AS total_amount,
         CAST(CAST(o_orderkey % 50 AS DOUBLE) / 2 AS DECIMAL(12,2)) AS shipping_cost,
         CASE WHEN o_orderkey % 4 = 0 THEN 'Credit Card' WHEN o_orderkey % 4 = 1 THEN 'PayPal'
              WHEN o_orderkey % 4 = 2 THEN 'Debit Card' ELSE 'Gift Card' END AS payment_method,
         CAST(o_orderkey % 900 + 1 AS VARCHAR) || ' Elm Street' AS shipping_address,
         CAST(o_orderkey % 700 + 1 AS VARCHAR) || ' Oak Avenue' AS billing_address,
         o_orderdate AS loaded_at
  FROM orders),
stg_order_items AS (
  SELECT 'I' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS order_item_id,
         'O' || CAST(l_orderkey AS VARCHAR) AS order_id,
         'P' || CAST(l_partkey AS VARCHAR) AS product_id,
         CAST(l_quantity AS INT) AS quantity,
         CAST(CAST((l_partkey + l_linenumber) % 9000 + 100 AS DOUBLE) / 100 AS DECIMAL(12,2)) AS unit_price,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS total_price,
         l_shipdate AS created_at
  FROM lineitem),
stg_products AS (
  SELECT 'P' || CAST(p_partkey AS VARCHAR) AS product_id,
         CAST(p_partkey % 8 + 1 AS VARCHAR) AS category_id,
         CAST(p_partkey % 32 + 1 AS VARCHAR) AS subcategory_id,
         p_name AS product_name,
         p_type || ' / size ' || CAST(p_size AS VARCHAR) AS description,
         CAST(p_retailprice AS DECIMAL(12,2)) AS base_price,
         CAST(p_retailprice - 1.0 AS DECIMAL(12,2)) AS sale_price,
         p_size AS stock_quantity,
         CAST(CAST(p_partkey % 200 AS DOUBLE) / 10 AS DECIMAL(8,2)) AS weight_kg,
         CASE WHEN p_partkey % 53 = 0 THEN NULL
              WHEN p_partkey % 7 = 0 THEN ' ' || p_brand || ' '
              ELSE p_brand END AS brand,
         CAST(CAST(p_partkey % 41 + 10 AS DOUBLE) / 10 AS DECIMAL(3,1)) AS rating,
         p_partkey % 13 <> 0 AS is_active,
         CAST(DATE '1994-01-01' + CAST(p_partkey % 1000 AS INT) AS TIMESTAMP) AS created_at
  FROM part),
stg_reviews AS (
  SELECT 'R' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS review_id,
         'P' || CAST(l_partkey AS VARCHAR) AS product_id,
         'O' || CAST(l_orderkey AS VARCHAR) AS order_id,
         'C' || CAST(o_custkey AS VARCHAR) AS customer_id,
         CAST((l_orderkey + l_linenumber) % 5 + 1 AS INT) AS review_score,
         'review ' || CAST(l_orderkey AS VARCHAR) || ' ' || CAST(l_partkey AS VARCHAR) AS review_text,
         CAST(CAST(l_shipdate AS DATE) + CAST(l_linenumber AS INT) AS TIMESTAMP) AS loaded_at
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 3 = 0 AND l_linenumber <= 2),
stg_categories AS (
  SELECT CAST(i AS VARCHAR) AS category_id,
         'Category ' || CAST(i AS VARCHAR) AS category_name,
         CAST(DATE '1993-01-01' + CAST(i AS INT) AS TIMESTAMP) AS created_at
  FROM range(1, 9) t(i)),
stg_subcategories AS (
  SELECT CAST(i AS VARCHAR) AS subcategory_id,
         CAST((i - 1) % 8 + 1 AS VARCHAR) AS category_id,
         'Subcategory ' || CAST(i AS VARCHAR) AS subcategory_name,
         CAST(DATE '1993-02-01' + CAST(i AS INT) AS TIMESTAMP) AS created_at
  FROM range(1, 33) t(i)),
stg_interactions AS (
  SELECT 'E' || CAST(event_id AS VARCHAR) AS event_id,
         'C' || CAST(user_id % (SELECT MAX(c_custkey) FROM customer) + 1 AS VARCHAR) AS customer_id,
         'P' || CAST(event_id % (SELECT MAX(p_partkey) FROM part) + 1 AS VARCHAR) AS product_id,
         CASE WHEN event_id % 8 = 3 THEN 'cart_add' WHEN event_id % 8 = 4 THEN 'purchase'
              WHEN event_id % 8 = 5 THEN 'wishlist_add' ELSE 'view' END AS event_type,
         CAST(ts AS TIMESTAMP) AS event_date,
         CASE WHEN user_id % 3 = 0 THEN 'mobile' WHEN user_id % 3 = 1 THEN 'desktop' ELSE 'tablet' END AS device_type,
         'S' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 5 AS VARCHAR) AS session_id,
         CAST(ts AS TIMESTAMP) AS created_at
  FROM events),
education_types AS (
  SELECT DISTINCT ${sk("education")} AS education_id, education AS education_type, $NOW AS created_at
  FROM stg_customers WHERE education IS NOT NULL),
marital_statuses AS (
  SELECT DISTINCT ${sk("marital_status")} AS marital_status_id, marital_status AS status_type, $NOW AS created_at
  FROM stg_customers WHERE marital_status IS NOT NULL),
order_statuses AS (
  SELECT DISTINCT ${sk("status")} AS status_id, status AS status_name, $NOW AS created_at
  FROM stg_orders WHERE status IS NOT NULL),
payment_methods AS (
  SELECT DISTINCT ${sk("payment_method")} AS payment_method_id, payment_method AS method_name, $NOW AS created_at
  FROM stg_orders WHERE payment_method IS NOT NULL),
brands AS (
  SELECT ${sk("brand_name")} AS brand_id, brand_name, $NOW AS created_at
  FROM (SELECT DISTINCT TRIM(brand) AS brand_name FROM stg_products
        WHERE brand IS NOT NULL AND TRIM(brand) <> '') b),
locations AS (
  SELECT DISTINCT ${sk("city", "state", "country")} AS location_id,
         city, state, country, $NOW AS created_at
  FROM (
    SELECT DISTINCT TRIM(SPLIT_PART(shipping_address, ',', -3)) AS city,
                    TRIM(SPLIT_PART(shipping_address, ',', -2)) AS state,
                    TRIM(SPLIT_PART(shipping_address, ',', -1)) AS country
    FROM stg_orders WHERE shipping_address IS NOT NULL
    UNION
    SELECT DISTINCT TRIM(SPLIT_PART(billing_address, ',', -3)),
                    TRIM(SPLIT_PART(billing_address, ',', -2)),
                    TRIM(SPLIT_PART(billing_address, ',', -1))
    FROM stg_orders WHERE billing_address IS NOT NULL
    UNION
    SELECT DISTINCT TRIM(city), TRIM(state), TRIM(country)
    FROM stg_customers WHERE city IS NOT NULL AND state IS NOT NULL AND country IS NOT NULL
  ) u
  WHERE city <> '' AND state <> '' AND country <> ''
    AND city IS NOT NULL AND state IS NOT NULL AND country IS NOT NULL),
addresses AS (
  SELECT DISTINCT ${sk("pa.address")} AS address_id,
         pa.street_address, pa.postal_code,
         COALESCE(l.location_id, ${sk("pa.city", "pa.state", "pa.country")}) AS location_id,
         $NOW AS created_at, pa.address
  FROM (
    SELECT DISTINCT shipping_address AS address,
           TRIM(SPLIT_PART(shipping_address, ',', 1)) AS street_address,
           TRIM(SPLIT_PART(shipping_address, ',', -4)) AS postal_code,
           TRIM(SPLIT_PART(shipping_address, ',', -3)) AS city,
           TRIM(SPLIT_PART(shipping_address, ',', -2)) AS state,
           TRIM(SPLIT_PART(shipping_address, ',', -1)) AS country
    FROM stg_orders WHERE shipping_address IS NOT NULL
    UNION
    SELECT DISTINCT billing_address,
           TRIM(SPLIT_PART(billing_address, ',', 1)),
           TRIM(SPLIT_PART(billing_address, ',', -4)),
           TRIM(SPLIT_PART(billing_address, ',', -3)),
           TRIM(SPLIT_PART(billing_address, ',', -2)),
           TRIM(SPLIT_PART(billing_address, ',', -1))
    FROM stg_orders WHERE billing_address IS NOT NULL
  ) pa
  LEFT JOIN locations l ON pa.city = l.city AND pa.state = l.state AND pa.country = l.country
  WHERE pa.city <> '' AND pa.state <> '' AND pa.country <> ''),
customers_enriched AS (
  SELECT v.customer_id, v.email, v.first_name, v.last_name, v.age, v.gender, v.annual_income,
         e.education_id, m.marital_status_id,
         COALESCE(l.location_id, ${sk("v.cleaned_city", "v.cleaned_state", "v.cleaned_country")}) AS location_id,
         v.signup_date, v.last_login, v.preferred_channel, v.is_active,
         COALESCE(oa.total_orders, 0) AS total_orders,
         COALESCE(oa.total_spent, 0) AS total_spent,
         oa.first_order_date, oa.last_order_date,
         v.loaded_at AS created_at
  FROM (SELECT *, TRIM(city) AS cleaned_city, TRIM(state) AS cleaned_state, TRIM(country) AS cleaned_country
        FROM stg_customers
        WHERE city IS NOT NULL AND state IS NOT NULL AND country IS NOT NULL
          AND TRIM(city) <> '' AND TRIM(state) <> '' AND TRIM(country) <> '') v
  LEFT JOIN education_types e ON v.education = e.education_type
  LEFT JOIN marital_statuses m ON v.marital_status = m.status_type
  LEFT JOIN locations l ON v.cleaned_city = l.city AND v.cleaned_state = l.state AND v.cleaned_country = l.country
  LEFT JOIN (SELECT customer_id, COUNT(DISTINCT order_id) AS total_orders, SUM(total_amount) AS total_spent,
                    MIN(order_date) AS first_order_date, MAX(order_date) AS last_order_date
             FROM stg_orders GROUP BY customer_id) oa ON v.customer_id = oa.customer_id),
products_enriched AS (
  SELECT p.product_id, p.product_name, p.description, p.base_price, p.sale_price, p.stock_quantity,
         p.weight_kg, p.is_active, b.brand_id, p.category_id, p.subcategory_id,
         COALESCE(po.total_orders, 0) AS total_orders,
         COALESCE(po.total_quantity_sold, 0) AS total_quantity_sold,
         COALESCE(po.total_revenue, 0) AS total_revenue,
         COALESCE(pr.review_count, 0) AS review_count,
         pr.avg_review_score, p.created_at
  FROM stg_products p
  LEFT JOIN brands b ON TRIM(p.brand) = b.brand_name
  LEFT JOIN (SELECT product_id, COUNT(DISTINCT order_id) AS total_orders,
                    SUM(quantity) AS total_quantity_sold, SUM(total_price) AS total_revenue
             FROM stg_order_items GROUP BY product_id) po ON p.product_id = po.product_id
  LEFT JOIN (SELECT product_id, COUNT(*) AS review_count,
                    CAST(SUM(review_score) AS DOUBLE) / COUNT(review_score) AS avg_review_score
             FROM stg_reviews GROUP BY product_id) pr ON p.product_id = pr.product_id
  WHERE p.product_id IS NOT NULL),
int_orders AS (
  SELECT o.order_id, o.customer_id, o.order_date, os.status_id, pm.payment_method_id,
         sa.address_id AS shipping_address_id, ba.address_id AS billing_address_id,
         o.total_amount, o.shipping_cost,
         COUNT(DISTINCT oi.product_id) AS unique_products,
         SUM(oi.quantity) AS total_items,
         BOOL_OR(r.review_score IS NOT NULL) AS has_review,
         CAST(SUM(r.review_score) AS DOUBLE) / COUNT(r.review_score) AS avg_review_score,
         o.loaded_at AS created_at
  FROM stg_orders o
  LEFT JOIN order_statuses os ON o.status = os.status_name
  LEFT JOIN payment_methods pm ON o.payment_method = pm.method_name
  LEFT JOIN addresses sa ON o.shipping_address = sa.street_address
  LEFT JOIN addresses ba ON o.billing_address = ba.street_address
  LEFT JOIN (SELECT order_id, product_id, quantity FROM stg_order_items) oi ON o.order_id = oi.order_id
  LEFT JOIN (SELECT order_id, review_score FROM stg_reviews) r ON o.order_id = r.order_id
  GROUP BY o.order_id, o.customer_id, o.order_date, os.status_id, pm.payment_method_id,
           sa.address_id, ba.address_id, o.total_amount, o.shipping_cost, o.loaded_at),
int_order_items AS (
  SELECT DISTINCT v.order_item_id, v.order_id, v.product_id, so.customer_id,
         v.quantity, v.unit_price, v.total_price,
         pe.category_id, pe.subcategory_id, pe.brand_id, rd.review_score, v.created_at
  FROM (SELECT DISTINCT * FROM stg_order_items
        WHERE product_id IS NOT NULL
          AND product_id IN (SELECT product_id FROM products_enriched)) v
  LEFT JOIN (SELECT order_id, customer_id FROM stg_orders) so ON v.order_id = so.order_id
  LEFT JOIN (SELECT product_id, category_id, subcategory_id, brand_id FROM products_enriched) pe
    ON v.product_id = pe.product_id
  LEFT JOIN (SELECT DISTINCT order_id, product_id,
                    FIRST_VALUE(review_score) OVER (PARTITION BY order_id, product_id
                      ORDER BY loaded_at DESC, review_id DESC) AS review_score
             FROM stg_reviews) rd ON v.order_id = rd.order_id AND v.product_id = rd.product_id),
categories_enriched AS (
  SELECT c.category_id, c.category_name,
         COUNT(DISTINCT s.subcategory_id) AS subcategory_count,
         COUNT(DISTINCT p.product_id) AS product_count,
         c.created_at
  FROM stg_categories c
  LEFT JOIN stg_subcategories s ON c.category_id = s.category_id
  LEFT JOIN stg_products p ON c.category_id = p.category_id
  GROUP BY c.category_id, c.category_name, c.created_at),
subcategories_enriched AS (
  SELECT s.subcategory_id, s.subcategory_name, s.category_id,
         COUNT(DISTINCT p.product_id) AS product_count,
         s.created_at
  FROM stg_subcategories s
  LEFT JOIN stg_products p ON s.subcategory_id = p.subcategory_id
  GROUP BY s.subcategory_id, s.subcategory_name, s.category_id, s.created_at),
reviews_enriched AS (
  SELECT r.review_id, r.product_id, r.order_id, r.customer_id, r.review_score,
         r.review_text, p.product_name, c.category_name, s.subcategory_name,
         b.brand_name, r.loaded_at AS created_at
  FROM stg_reviews r
  LEFT JOIN products_enriched p ON r.product_id = p.product_id
  LEFT JOIN categories_enriched c ON p.category_id = c.category_id
  LEFT JOIN subcategories_enriched s ON p.subcategory_id = s.subcategory_id
  LEFT JOIN brands b ON p.brand_id = b.brand_id),
customer_interactions AS (
  SELECT i.event_id, i.customer_id, i.product_id, p.category_id, p.subcategory_id,
         i.event_type, i.event_date, i.device_type, i.session_id, i.created_at
  FROM stg_interactions i
  LEFT JOIN stg_products p ON i.product_id = p.product_id)
"""

  private val baseOracle: Map[String, String] = Map(
    "ecom_locations" -> (stagePrefix +
      "SELECT location_id, city, state, country, created_at FROM locations ORDER BY location_id"),

    "ecom_addresses_quirk" -> (stagePrefix +
      """SELECT (SELECT COUNT(*) FROM addresses) AS n_addresses,
        | (SELECT COUNT(shipping_address_id) FROM int_orders) AS n_shipping_fk,
        | (SELECT COUNT(billing_address_id) FROM int_orders) AS n_billing_fk""".stripMargin),

    "ecom_customers_enriched" -> (stagePrefix +
      """SELECT customer_id, email, first_name, last_name, age, gender,
        | CAST(annual_income AS DOUBLE) AS annual_income,
        | education_id, marital_status_id, location_id,
        | signup_date, last_login, preferred_channel, is_active,
        | total_orders, CAST(total_spent AS DOUBLE) AS total_spent,
        | first_order_date, last_order_date, created_at
        |FROM customers_enriched ORDER BY customer_id""".stripMargin),

    "ecom_products_enriched" -> (stagePrefix +
      """SELECT product_id, product_name, description,
        | CAST(base_price AS DOUBLE) AS base_price, CAST(sale_price AS DOUBLE) AS sale_price,
        | stock_quantity, CAST(weight_kg AS DOUBLE) AS weight_kg, is_active,
        | brand_id, category_id, subcategory_id, total_orders,
        | CAST(total_quantity_sold AS BIGINT) AS total_quantity_sold,
        | CAST(total_revenue AS DOUBLE) AS total_revenue,
        | CAST(review_count AS BIGINT) AS review_count, avg_review_score, created_at
        |FROM products_enriched ORDER BY product_id""".stripMargin),

    "ecom_orders" -> (stagePrefix +
      """SELECT order_id, customer_id, order_date, status_id, payment_method_id,
        | shipping_address_id, billing_address_id,
        | CAST(total_amount AS DOUBLE) AS total_amount,
        | CAST(shipping_cost AS DOUBLE) AS shipping_cost,
        | unique_products, CAST(total_items AS BIGINT) AS total_items,
        | has_review, avg_review_score, created_at
        |FROM int_orders ORDER BY order_id""".stripMargin),

    "ecom_order_items" -> (stagePrefix +
      """SELECT order_item_id, order_id, product_id, customer_id, quantity,
        | CAST(unit_price AS DOUBLE) AS unit_price,
        | CAST(total_price AS DOUBLE) AS total_price,
        | category_id, subcategory_id, brand_id, review_score, created_at
        |FROM int_order_items ORDER BY order_item_id""".stripMargin),

    "ecom_categories_enriched" -> (stagePrefix +
      """SELECT category_id, category_name, subcategory_count, product_count, created_at
        |FROM categories_enriched ORDER BY category_id""".stripMargin),

    "ecom_subcategories_enriched" -> (stagePrefix +
      """SELECT subcategory_id, subcategory_name, category_id, product_count, created_at
        |FROM subcategories_enriched ORDER BY subcategory_id""".stripMargin),

    "ecom_reviews_enriched" -> (stagePrefix +
      """SELECT review_id, product_id, order_id, customer_id, review_score, review_text,
        | product_name, category_name, subcategory_name, brand_name, created_at
        |FROM reviews_enriched ORDER BY review_id""".stripMargin),

    "ecom_customer_interactions" -> (stagePrefix +
      """SELECT event_id, customer_id, product_id, category_id, subcategory_id,
        | event_type, event_date, device_type, session_id, created_at
        |FROM customer_interactions ORDER BY event_id""".stripMargin),

    "ecom_dim_customers" -> (stagePrefix +
      s"""SELECT ce.customer_id, ce.email, ce.first_name, ce.last_name, ce.age, ce.gender,
        | CAST(ce.annual_income AS DOUBLE) AS annual_income,
        | l.city, l.state, l.country, e.education_type, m.status_type AS marital_status,
        | COALESCE(o.total_orders, 0) AS total_orders,
        | CAST(COALESCE(o.total_spent, 0) AS DOUBLE) AS total_spent,
        | COALESCE(CAST(o.total_spent AS DOUBLE) / NULLIF(o.total_orders, 0), 0) AS avg_order_value,
        | o.first_order_date, o.last_order_date,
        | CASE WHEN o.last_order_date >= TIMESTAMP '1998-03-01 00:00:00' THEN 'Active'
        |      WHEN o.last_order_date >= TIMESTAMP '1997-12-01 00:00:00' THEN 'At Risk'
        |      ELSE 'Churned' END AS customer_status,
        | CAST(date_diff('day', CAST(COALESCE(o.first_order_date, ce.signup_date) AS DATE), DATE '1998-06-01') AS INT) AS customer_lifetime_days,
        | ce.signup_date, ce.last_login, ce.is_active, ce.created_at, $NOW AS updated_at
        |FROM customers_enriched ce
        |LEFT JOIN locations l ON ce.location_id = l.location_id
        |LEFT JOIN education_types e ON ce.education_id = e.education_id
        |LEFT JOIN marital_statuses m ON ce.marital_status_id = m.marital_status_id
        |LEFT JOIN (SELECT customer_id, COUNT(DISTINCT order_id) AS total_orders,
        |                  SUM(total_amount) AS total_spent, MIN(order_date) AS first_order_date,
        |                  MAX(order_date) AS last_order_date
        |           FROM int_orders GROUP BY customer_id) o ON ce.customer_id = o.customer_id
        |ORDER BY ce.customer_id""".stripMargin),

    "ecom_dim_products" -> (stagePrefix +
      s"""SELECT p.product_id, c.category_id, p.product_name, p.description,
        | CAST(p.base_price AS DOUBLE) AS base_price, CAST(p.sale_price AS DOUBLE) AS sale_price,
        | p.stock_quantity, c.category_name, s.subcategory_name, b.brand_name,
        | p.is_active, p.created_at, $NOW AS updated_at
        |FROM products_enriched p
        |LEFT JOIN categories_enriched c ON p.category_id = c.category_id
        |LEFT JOIN subcategories_enriched s ON p.subcategory_id = s.subcategory_id
        |LEFT JOIN brands b ON p.brand_id = b.brand_id
        |ORDER BY product_id""".stripMargin),

    "ecom_dim_categories" -> (stagePrefix +
      """SELECT c.category_id, c.category_name, ch.subcategories, c.created_at
        |FROM categories_enriched c
        |LEFT JOIN (SELECT c2.category_id,
        |                  STRING_AGG(DISTINCT s.subcategory_name, ', ' ORDER BY s.subcategory_name) AS subcategories
        |           FROM categories_enriched c2
        |           LEFT JOIN subcategories_enriched s ON c2.category_id = s.category_id
        |           GROUP BY c2.category_id) ch ON c.category_id = ch.category_id
        |ORDER BY c.category_id""".stripMargin),

    "ecom_dim_locations" -> (stagePrefix +
      """SELECT l.location_id, l.city, l.state, l.country
        |FROM locations l
        |LEFT JOIN customers_enriched c ON l.location_id = c.location_id
        |LEFT JOIN int_orders o ON c.customer_id = o.customer_id
        |GROUP BY l.location_id, l.city, l.state, l.country
        |ORDER BY l.location_id""".stripMargin),

    "ecom_dim_dates" -> (stagePrefix +
      """SELECT DISTINCT date_day,
        | CAST(EXTRACT(YEAR FROM date_day) AS INT) AS year,
        | CAST(EXTRACT(MONTH FROM date_day) AS INT) AS month,
        | CAST(EXTRACT(DOW FROM date_day) AS INT) AS day_of_week,
        | CAST(date_trunc('month', date_day) AS TIMESTAMP) AS first_day_of_month,
        | last_day(CAST(date_day AS DATE)) AS last_day_of_month
        |FROM (SELECT order_date AS date_day FROM int_orders
        |      UNION
        |      SELECT event_date FROM customer_interactions) d
        |ORDER BY date_day""".stripMargin),

    "ecom_fct_sales_by_date" -> (stagePrefix +
      s"""SELECT TRY_CAST(order_date AS DATE) AS sale_date,
        | COUNT(DISTINCT order_id) AS total_orders,
        | COUNT(DISTINCT customer_id) AS unique_customers,
        | CAST(SUM(total_amount) AS DOUBLE) AS total_revenue,
        | CAST(SUM(shipping_cost) AS DOUBLE) AS total_shipping,
        | CAST(SUM(total_amount) - SUM(shipping_cost) AS DOUBLE) AS net_revenue,
        | CAST(SUM(total_amount) AS DOUBLE) / COUNT(total_amount) AS avg_order_value,
        | CAST(SUM(total_amount) AS DOUBLE) / COUNT(DISTINCT customer_id) AS revenue_per_customer,
        | $NOW AS updated_at
        |FROM int_orders GROUP BY TRY_CAST(order_date AS DATE) ORDER BY sale_date""".stripMargin),

    "ecom_fct_customer_orders" -> (stagePrefix +
      """SELECT customer_id, order_id, order_date,
        | CAST(total_amount AS DOUBLE) AS total_amount, unique_products,
        | CAST(total_items AS BIGINT) AS total_items, avg_order_value, avg_review_score
        |FROM (
        | SELECT o.customer_id, o.order_id, o.order_date, o.total_amount,
        |        COUNT(DISTINCT oi.product_id) AS unique_products,
        |        SUM(oi.quantity) AS total_items,
        |        CAST(o.total_amount AS DOUBLE) / NULLIF(COUNT(DISTINCT oi.product_id), 0) AS avg_order_value,
        |        CAST(SUM(r.review_score) AS DOUBLE) / COUNT(r.review_score) AS avg_review_score
        | FROM int_orders o
        | LEFT JOIN (SELECT order_id, product_id, quantity FROM int_order_items) oi ON o.order_id = oi.order_id
        | LEFT JOIN (SELECT order_id, review_score FROM reviews_enriched) r ON o.order_id = r.order_id
        | GROUP BY o.customer_id, o.order_id, o.order_date, o.total_amount) x
        |ORDER BY order_id""".stripMargin),

    "ecom_fct_customer_activity" -> (stagePrefix +
      s"""SELECT c.customer_id, c.email,
        | DATE_TRUNC('month', CAST(i.event_date AS DATE)) AS activity_month,
        | COUNT(CASE WHEN i.event_type = 'view' THEN 1 END) AS total_views,
        | COUNT(DISTINCT CASE WHEN i.event_type = 'view' THEN i.product_id END) AS unique_products_viewed,
        | COUNT(CASE WHEN i.event_type = 'cart_add' THEN 1 END) AS cart_adds,
        | COUNT(DISTINCT CASE WHEN i.event_type = 'cart_add' THEN i.product_id END) AS unique_products_added,
        | COUNT(CASE WHEN i.event_type = 'purchase' THEN 1 END) AS purchases,
        | COUNT(DISTINCT CASE WHEN i.event_type = 'purchase' THEN i.product_id END) AS unique_products_purchased,
        | COUNT(DISTINCT i.session_id) AS total_sessions,
        | COUNT(DISTINCT i.device_type) AS devices_used,
        | $NOW AS updated_at
        |FROM customers_enriched c
        |LEFT JOIN customer_interactions i ON c.customer_id = i.customer_id
        |WHERE CAST(i.event_date AS DATE) IS NOT NULL
        |GROUP BY c.customer_id, c.email, DATE_TRUNC('month', CAST(i.event_date AS DATE))
        |ORDER BY c.customer_id, activity_month""".stripMargin),

    "ecom_fct_customer_reviews" -> (stagePrefix +
      """SELECT r.customer_id, r.product_id, r.order_id, r.review_score, r.review_text,
        | p.category_id, p.subcategory_id, r.created_at
        |FROM reviews_enriched r JOIN products_enriched p ON r.product_id = p.product_id
        |ORDER BY r.customer_id, r.product_id, r.order_id, r.review_score, r.review_text""".stripMargin),

    "ecom_fct_order_details" -> (stagePrefix +
      s"""SELECT o.order_id, o.order_date, o.customer_id, c.email,
        | lc.city AS customer_city, lc.state AS customer_state,
        | oi.product_id, p.product_name, ca.category_name, b.brand_name,
        | os.status_name, pm.method_name AS payment_method,
        | sa.street_address AS shipping_address, ls.city AS shipping_city, ls.state AS shipping_state,
        | oi.quantity, CAST(oi.unit_price AS DOUBLE) AS unit_price,
        | CAST(oi.total_price AS DOUBLE) AS item_total,
        | CAST(o.shipping_cost AS DOUBLE) AS shipping_cost,
        | CAST(o.total_amount AS DOUBLE) AS order_total,
        | r.review_score, o.created_at, $NOW AS updated_at
        |FROM int_orders o
        |JOIN int_order_items oi ON o.order_id = oi.order_id
        |JOIN customers_enriched c ON o.customer_id = c.customer_id
        |JOIN locations lc ON c.location_id = lc.location_id
        |JOIN products_enriched p ON oi.product_id = p.product_id
        |JOIN categories_enriched ca ON p.category_id = ca.category_id
        |JOIN brands b ON p.brand_id = b.brand_id
        |LEFT JOIN order_statuses os ON o.status_id = os.status_id
        |LEFT JOIN payment_methods pm ON o.payment_method_id = pm.payment_method_id
        |LEFT JOIN addresses sa ON o.shipping_address_id = sa.address_id
        |LEFT JOIN locations ls ON sa.location_id = ls.location_id
        |LEFT JOIN reviews_enriched r ON o.order_id = r.order_id AND oi.product_id = r.product_id
        |ORDER BY o.order_id, oi.product_id, oi.quantity, unit_price, item_total, r.review_score NULLS FIRST""".stripMargin),

    "ecom_fct_product_performance" -> (stagePrefix +
      """SELECT product_id, month, total_orders,
        | CAST(units_sold AS BIGINT) AS units_sold,
        | CAST(revenue AS DOUBLE) AS revenue, avg_rating, review_count
        |FROM (
        | SELECT p.product_id, CAST(date_trunc('month', o.order_date) AS TIMESTAMP) AS month,
        |        COUNT(DISTINCT o.order_id) AS total_orders,
        |        SUM(oi.quantity) AS units_sold,
        |        SUM(oi.total_price) AS revenue,
        |        CAST(SUM(r.review_score) AS DOUBLE) / COUNT(r.review_score) AS avg_rating,
        |        COUNT(DISTINCT r.review_score) AS review_count
        | FROM products_enriched p
        | LEFT JOIN int_order_items oi ON p.product_id = oi.product_id
        | LEFT JOIN int_orders o ON oi.order_id = o.order_id
        | LEFT JOIN reviews_enriched r ON p.product_id = r.product_id
        | GROUP BY p.product_id, CAST(date_trunc('month', o.order_date) AS TIMESTAMP)) x
        |ORDER BY product_id, month NULLS FIRST""".stripMargin),

    "ecom_fct_product_interactions" -> (stagePrefix +
      """SELECT product_id, CAST(date_trunc('day', event_date) AS TIMESTAMP) AS event_day,
        | COUNT(DISTINCT CASE WHEN event_type = 'view' THEN event_id END) AS views,
        | COUNT(DISTINCT CASE WHEN event_type = 'cart_add' THEN event_id END) AS cart_adds,
        | COUNT(DISTINCT CASE WHEN event_type = 'wishlist_add' THEN event_id END) AS wishlist_adds,
        | COUNT(DISTINCT customer_id) AS unique_customers
        |FROM customer_interactions
        |GROUP BY product_id, CAST(date_trunc('day', event_date) AS TIMESTAMP)
        |ORDER BY product_id, event_day""".stripMargin),

    "ecom_fct_sales_by_product" -> (stagePrefix +
      """SELECT product_id, category_id, sales_month, total_orders,
        | CAST(units_sold AS BIGINT) AS units_sold,
        | CAST(revenue AS DOUBLE) AS revenue, avg_selling_price
        |FROM (
        | SELECT p.product_id, p.category_id,
        |        CAST(date_trunc('month', o.order_date) AS TIMESTAMP) AS sales_month,
        |        COUNT(DISTINCT o.order_id) AS total_orders,
        |        SUM(oi.quantity) AS units_sold,
        |        SUM(oi.total_price) AS revenue,
        |        CAST(SUM(oi.unit_price) AS DOUBLE) / COUNT(oi.unit_price) AS avg_selling_price
        | FROM products_enriched p
        | JOIN int_order_items oi ON p.product_id = oi.product_id
        | JOIN int_orders o ON oi.order_id = o.order_id
        | GROUP BY p.product_id, p.category_id, CAST(date_trunc('month', o.order_date) AS TIMESTAMP)) x
        |ORDER BY product_id, sales_month""".stripMargin),

    "ecom_fct_sales_by_region" -> (stagePrefix +
      """SELECT state, country, sales_month, total_orders, unique_customers,
        | CAST(total_revenue AS DOUBLE) AS total_revenue, avg_order_value
        |FROM (
        | SELECT l.state, l.country,
        |        CAST(date_trunc('month', o.order_date) AS TIMESTAMP) AS sales_month,
        |        COUNT(DISTINCT o.order_id) AS total_orders,
        |        COUNT(DISTINCT o.customer_id) AS unique_customers,
        |        SUM(o.total_amount) AS total_revenue,
        |        CAST(SUM(o.total_amount) AS DOUBLE) / COUNT(o.total_amount) AS avg_order_value
        | FROM int_orders o
        | JOIN customers_enriched c ON o.customer_id = c.customer_id
        | JOIN locations l ON c.location_id = l.location_id
        | GROUP BY l.state, l.country, CAST(date_trunc('month', o.order_date) AS TIMESTAMP)) x
        |ORDER BY state, country, sales_month""".stripMargin)
  )

  // ------------------------------------------------- qa_schema_tests ----

  /** Mart CTEs for the schema-test oracle, recovered VERBATIM from the
    * per-model oracle bodies above (each entry is stagePrefix + body, so
    * the body strips back out) — the qa matrix audits the exact same
    * derivations the per-model hash compares certify. */
  private val qaMartCtes: String = Seq(
    "dim_dates", "dim_categories", "dim_products", "dim_customers",
    "fct_customer_activity", "fct_order_details", "fct_sales_by_date",
    "fct_sales_by_product", "fct_sales_by_region", "fct_customer_orders",
    "fct_customer_reviews", "fct_product_performance",
    "fct_product_interactions")
    .map(m => s"qa_$m AS (${baseOracle(s"ecom_$m").stripPrefix(stagePrefix)})")
    .mkString(",\n")

  /** Logical table id → oracle CTE name. src_* resolves to stg_* — staging
    * is a row-preserving pure cast (Ecom.cast) and every source-tier
    * tested column is a string passthrough, so the raw-tier counts are
    * identical by construction. */
  private val qaRel: String => String = {
    case s if s.startsWith("src_") => "stg_" + s.stripPrefix("src_")
    case "orders" => "int_orders"
    case "order_items" => "int_order_items"
    case m if m.startsWith("dim_") || m.startsWith("fct_") => s"qa_$m"
    case other => other
  }

  def oracle: Map[String, String] = {
    // The stream twin computes the SAME 150-check frame (only the landing
    // strategy differs), so it replays against the same SQL.
    val qaSql = stagePrefix + ",\n" + qaMartCtes + "\n" +
      graft.ecom.EcomSchemaTests.oracleSelect(qaRel)
    baseOracle + ("qa_schema_tests" -> qaSql) +
      ("qa_schema_tests_stream" -> qaSql)
  }
}
