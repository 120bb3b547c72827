package graft.ecom

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.F
import graft.plans.ModelGraph
import graft.plans.ModelGraph.{Model, Table, View}

/** The reference's e-commerce medallion pipeline — raw → staging →
  * intermediate → marts — re-expressed as pure DataFrame models over
  * [[graft.plans.ModelGraph]].
  *
  * Semantics follow the dbt models under
  * `dbt/dbt_duckdb/models/{ecom_staging,ecom_intermediate,ecom_marts}`
  * (file:line cites on each model), including the verified quirk
  * (SURVEY §2.8 ⚠): generated addresses contain no commas, so the
  * SPLIT_PART city/state/country parses are `''`, `addresses`
  * materializes EMPTY, `locations` populates only from customer rows, and
  * order address FKs are NULL. That behavior is reproduced, not "fixed".
  *
  * Nondeterministic values are injected: `now`/`today` are parameters
  * (reference uses CURRENT_TIMESTAMP/CURRENT_DATE — SURVEY §7.4 #3).
  */
object Ecom {

  // ------------------------------------------------------------ staging --
  // One CAST per column, lowercase aliases — the 8 view models under
  // ecom_staging (pattern: stg_customers.sql:5-26).

  private def cast(df: DataFrame, spec: (String, String, String)*): DataFrame =
    df.select(spec.map { case (src, dst, t) => col(src).cast(t).as(dst) }: _*)

  def stgCustomers(raw: DataFrame): DataFrame = cast(raw,
    ("CUSTOMER_ID", "customer_id", "string"), ("EMAIL", "email", "string"),
    ("FIRST_NAME", "first_name", "string"), ("LAST_NAME", "last_name", "string"),
    ("AGE", "age", "int"), ("GENDER", "gender", "string"),
    ("ANNUAL_INCOME", "annual_income", "decimal(12,2)"),
    ("MARITAL_STATUS", "marital_status", "string"), ("EDUCATION", "education", "string"),
    ("LOCATION_TYPE", "location_type", "string"), ("CITY", "city", "string"),
    ("STATE", "state", "string"), ("COUNTRY", "country", "string"),
    ("SIGNUP_DATE", "signup_date", "timestamp"), ("LAST_LOGIN", "last_login", "timestamp"),
    ("PREFERRED_CHANNEL", "preferred_channel", "string"), ("IS_ACTIVE", "is_active", "boolean"),
    ("LOADED_AT", "loaded_at", "timestamp"))

  def stgOrders(raw: DataFrame): DataFrame = cast(raw,
    ("ORDER_ID", "order_id", "string"), ("CUSTOMER_ID", "customer_id", "string"),
    ("ORDER_DATE", "order_date", "timestamp"), ("STATUS", "status", "string"),
    ("TOTAL_AMOUNT", "total_amount", "decimal(12,2)"),
    ("SHIPPING_COST", "shipping_cost", "decimal(12,2)"),
    ("PAYMENT_METHOD", "payment_method", "string"),
    ("SHIPPING_ADDRESS", "shipping_address", "string"),
    ("BILLING_ADDRESS", "billing_address", "string"),
    ("LOADED_AT", "loaded_at", "timestamp"))

  def stgOrderItems(raw: DataFrame): DataFrame = cast(raw,
    ("ORDER_ITEM_ID", "order_item_id", "string"), ("ORDER_ID", "order_id", "string"),
    ("PRODUCT_ID", "product_id", "string"), ("QUANTITY", "quantity", "int"),
    ("UNIT_PRICE", "unit_price", "decimal(12,2)"),
    ("TOTAL_PRICE", "total_price", "decimal(12,2)"),
    ("CREATED_AT", "created_at", "timestamp"))

  def stgProducts(raw: DataFrame): DataFrame = cast(raw,
    ("PRODUCT_ID", "product_id", "string"), ("CATEGORY_ID", "category_id", "string"),
    ("SUBCATEGORY_ID", "subcategory_id", "string"), ("PRODUCT_NAME", "product_name", "string"),
    ("BASE_PRICE", "base_price", "decimal(12,2)"), ("SALE_PRICE", "sale_price", "decimal(12,2)"),
    ("STOCK_QUANTITY", "stock_quantity", "int"), ("BRAND", "brand", "string"),
    ("RATING", "rating", "decimal(3,1)"), ("IS_ACTIVE", "is_active", "boolean"))

  def stgReviews(raw: DataFrame): DataFrame = cast(raw,
    ("REVIEW_ID", "review_id", "string"), ("PRODUCT_ID", "product_id", "string"),
    ("ORDER_ID", "order_id", "string"), ("CUSTOMER_ID", "customer_id", "string"),
    ("REVIEW_SCORE", "review_score", "int"), ("REVIEW_TEXT", "review_text", "string"),
    ("LOADED_AT", "loaded_at", "timestamp"))

  def stgCategories(raw: DataFrame): DataFrame = cast(raw,
    ("CATEGORY_ID", "category_id", "string"), ("CATEGORY_NAME", "category_name", "string"))

  def stgSubcategories(raw: DataFrame): DataFrame = cast(raw,
    ("SUBCATEGORY_ID", "subcategory_id", "string"), ("CATEGORY_ID", "category_id", "string"),
    ("SUBCATEGORY_NAME", "subcategory_name", "string"))

  def stgInteractions(raw: DataFrame): DataFrame = cast(raw,
    ("EVENT_ID", "event_id", "string"), ("CUSTOMER_ID", "customer_id", "string"),
    ("PRODUCT_ID", "product_id", "string"), ("EVENT_TYPE", "event_type", "string"),
    ("EVENT_DATE", "event_date", "timestamp"), ("DEVICE_TYPE", "device_type", "string"),
    ("SESSION_ID", "session_id", "string"))

  // ------------------------------------------------------- intermediate --

  /** Lookup-dim pattern (lookups/education_types.sql etc.): DISTINCT value
    * + md5 surrogate key. */
  private def lookup(src: DataFrame, valueCol: String, idName: String,
      outName: String, now: Timestamp): DataFrame =
    src.filter(col(valueCol).isNotNull)
      .select(F.surrogateKey(col(valueCol)).as(idName),
        col(valueCol).as(outName), lit(now).as("created_at"))
      .distinct()

  def educationTypes(stgCustomers: DataFrame, now: Timestamp): DataFrame =
    lookup(stgCustomers, "education", "education_id", "education_type", now)
  def maritalStatuses(stgCustomers: DataFrame, now: Timestamp): DataFrame =
    lookup(stgCustomers, "marital_status", "marital_status_id", "status_type", now)
  def orderStatuses(stgOrders: DataFrame, now: Timestamp): DataFrame =
    lookup(stgOrders, "status", "status_id", "status_name", now)
  def paymentMethods(stgOrders: DataFrame, now: Timestamp): DataFrame =
    lookup(stgOrders, "payment_method", "payment_method_id", "method_name", now)

  /** entities/brands.sql: distinct trimmed brand + surrogate key. */
  def brands(stgProducts: DataFrame, now: Timestamp): DataFrame =
    stgProducts.filter(col("brand").isNotNull && trim(col("brand")) =!= "")
      .select(trim(col("brand")).as("brand_name"))
      .distinct()
      .select(F.surrogateKey(col("brand_name")).as("brand_id"),
        col("brand_name"), lit(now).as("created_at"))

  private def addrPart(addr: Column, n: Int): Column =
    trim(split_part(addr, lit(","), lit(n)))

  /** entities/locations.sql:1-57 — union of shipping/billing/customer
    * city-state-country triples, blank-filtered. With comma-less addresses
    * the order-derived triples are '' and only customer rows survive. */
  def locations(stgOrders: DataFrame, stgCustomers: DataFrame, now: Timestamp): DataFrame = {
    def fromAddr(c: String) = stgOrders.filter(col(c).isNotNull)
      .select(addrPart(col(c), -3).as("city"), addrPart(col(c), -2).as("state"),
        addrPart(col(c), -1).as("country")).distinct()
    val fromCustomers = stgCustomers
      .filter(col("city").isNotNull && col("state").isNotNull && col("country").isNotNull)
      .select(trim(col("city")).as("city"), trim(col("state")).as("state"),
        trim(col("country")).as("country")).distinct()
    fromAddr("shipping_address")
      .unionByName(fromAddr("billing_address")).unionByName(fromCustomers)
      .distinct()
      .filter(col("city") =!= "" && col("state") =!= "" && col("country") =!= "" &&
        col("city").isNotNull && col("state").isNotNull && col("country").isNotNull)
      .select(F.surrogateKey(col("city"), col("state"), col("country")).as("location_id"),
        col("city"), col("state"), col("country"), lit(now).as("created_at"))
      .distinct()
  }

  /** entities/addresses.sql:1-44 — parses street/postal/city/state/country
    * from the address strings; the blank-parse validation rejects every
    * comma-less row, so this model is EMPTY on reference-shaped data. */
  def addresses(stgOrders: DataFrame, locations: DataFrame, now: Timestamp): DataFrame = {
    def parsed(c: String) = stgOrders.filter(col(c).isNotNull).select(
      col(c).as("address"), addrPart(col(c), 1).as("street_address"),
      addrPart(col(c), -4).as("postal_code"), addrPart(col(c), -3).as("city"),
      addrPart(col(c), -2).as("state"), addrPart(col(c), -1).as("country")).distinct()
    parsed("shipping_address").unionByName(parsed("billing_address")).distinct()
      .filter(col("city") =!= "" && col("state") =!= "" && col("country") =!= "")
      .join(locations.select("location_id", "city", "state", "country"),
        Seq("city", "state", "country"), "left")
      .select(F.surrogateKey(col("address")).as("address_id"),
        col("street_address"), col("postal_code"),
        coalesce(col("location_id"),
          F.surrogateKey(col("city"), col("state"), col("country"))).as("location_id"),
        lit(now).as("created_at"), col("address"))
      .distinct()
  }

  /** entities/customers_enriched.sql:1-58. */
  def customersEnriched(stgCustomers: DataFrame, stgOrders: DataFrame,
      educationTypes: DataFrame, maritalStatuses: DataFrame,
      locations: DataFrame): DataFrame = {
    val orderAgg = stgOrders.groupBy("customer_id").agg(
      countDistinct(col("order_id")).as("total_orders"),
      sum(col("total_amount")).as("total_spent"),
      min(col("order_date")).as("first_order_date"),
      max(col("order_date")).as("last_order_date"))
    val validated = stgCustomers
      .filter(col("city").isNotNull && col("state").isNotNull && col("country").isNotNull &&
        trim(col("city")) =!= "" && trim(col("state")) =!= "" && trim(col("country")) =!= "")
      .withColumn("cleaned_city", trim(col("city")))
      .withColumn("cleaned_state", trim(col("state")))
      .withColumn("cleaned_country", trim(col("country")))
    validated
      .join(educationTypes, validated("education") === educationTypes("education_type"), "left")
      .join(maritalStatuses, validated("marital_status") === maritalStatuses("status_type"), "left")
      .join(locations.select(col("location_id"), col("city").as("l_city"),
          col("state").as("l_state"), col("country").as("l_country")),
        col("cleaned_city") === col("l_city") && col("cleaned_state") === col("l_state") &&
          col("cleaned_country") === col("l_country"), "left")
      .join(orderAgg, Seq("customer_id"), "left")
      .select(col("customer_id"), col("email"), col("first_name"), col("last_name"),
        col("age"), col("gender"), col("annual_income"),
        col("education_id"), col("marital_status_id"),
        coalesce(col("location_id"),
          F.surrogateKey(col("cleaned_city"), col("cleaned_state"), col("cleaned_country")))
          .as("location_id"),
        col("signup_date"), col("last_login"), col("preferred_channel"), col("is_active"),
        coalesce(col("total_orders"), lit(0)).as("total_orders"),
        coalesce(col("total_spent"), lit(0)).as("total_spent"),
        col("first_order_date"), col("last_order_date"),
        col("loaded_at").as("created_at"))
  }

  /** entities/products_enriched.sql:1-63 — brand join ON expression
    * TRIM(brand) = brand_name (J4), category/subcategory joins, order and
    * review aggregates. */
  def productsEnriched(stgProducts: DataFrame, stgOrderItems: DataFrame,
      stgReviews: DataFrame, brands: DataFrame): DataFrame = {
    val orderAgg = stgOrderItems.groupBy("product_id").agg(
      countDistinct(col("order_id")).as("total_orders"),
      sum(col("quantity")).as("total_quantity_sold"))
    val reviewAgg = stgReviews.groupBy("product_id").agg(
      count(lit(1)).as("review_count"),
      avg(col("review_score")).as("avg_review_score"))
    stgProducts
      .join(brands, trim(stgProducts("brand")) === brands("brand_name"), "left")
      .join(orderAgg, Seq("product_id"), "left")
      .join(reviewAgg, Seq("product_id"), "left")
      .select(col("product_id"), col("category_id"), col("subcategory_id"),
        col("product_name"), col("base_price"), col("sale_price"),
        col("stock_quantity"), col("brand_id"), col("rating"), col("is_active"),
        coalesce(col("total_orders"), lit(0)).as("total_orders"),
        coalesce(col("total_quantity_sold"), lit(0)).as("total_quantity_sold"),
        coalesce(col("review_count"), lit(0)).as("review_count"),
        col("avg_review_score"))
  }

  /** transactions/orders.sql:1-29 — lookups, DOUBLE-ROLE address join
    * (shipping + billing, both null on reference-shaped data), item/review
    * aggregates, BOOL_OR has_review. */
  def ordersInt(stgOrders: DataFrame, orderStatuses: DataFrame,
      paymentMethods: DataFrame, addresses: DataFrame,
      stgOrderItems: DataFrame, stgReviews: DataFrame): DataFrame = {
    val sa = addresses.select(col("street_address").as("sa_street"),
      col("address_id").as("shipping_address_id"))
    val ba = addresses.select(col("street_address").as("ba_street"),
      col("address_id").as("billing_address_id"))
    stgOrders
      .join(orderStatuses, stgOrders("status") === orderStatuses("status_name"), "left")
      .join(paymentMethods, stgOrders("payment_method") === paymentMethods("method_name"), "left")
      .join(sa, stgOrders("shipping_address") === sa("sa_street"), "left")
      .join(ba, stgOrders("billing_address") === ba("ba_street"), "left")
      .join(stgOrderItems.select(col("order_id"), col("product_id"), col("quantity")),
        Seq("order_id"), "left")
      .join(stgReviews.select(col("order_id"), col("review_score")), Seq("order_id"), "left")
      .groupBy(col("order_id"), col("customer_id"), col("order_date"),
        col("status_id"), col("payment_method_id"),
        col("shipping_address_id"), col("billing_address_id"),
        col("total_amount"), col("shipping_cost"), col("loaded_at"))
      .agg(countDistinct(col("product_id")).as("unique_products"),
        sum(col("quantity")).as("total_items"),
        bool_or(col("review_score").isNotNull).as("has_review"),
        avg(col("review_score")).as("avg_review_score"))
      .withColumnRenamed("loaded_at", "created_at")
  }

  /** transactions/order_items.sql:1-58 — existence filter against
    * products_enriched (J7), FIRST_VALUE latest-review dedup (W1). */
  def orderItemsInt(stgOrderItems: DataFrame, stgOrders: DataFrame,
      productsEnriched: DataFrame, stgReviews: DataFrame): DataFrame = {
    val validated = stgOrderItems.filter(col("product_id").isNotNull)
      .join(productsEnriched.select("product_id").distinct(), Seq("product_id"), "left_semi")
      .distinct()
    val w = Window.partitionBy(col("order_id"), col("product_id"))
      .orderBy(col("loaded_at").desc, col("review_id").desc)
    val reviewsDeduped = stgReviews
      .select(col("order_id"), col("product_id"),
        first(col("review_score")).over(w).as("review_score"))
      .distinct()
    validated
      .join(stgOrders.select("order_id", "customer_id"), Seq("order_id"), "left")
      .join(productsEnriched.select("product_id", "category_id", "subcategory_id", "brand_id"),
        Seq("product_id"), "left")
      .join(reviewsDeduped, Seq("order_id", "product_id"), "left")
      .select(col("order_item_id"), col("order_id"), col("product_id"), col("customer_id"),
        col("quantity"), col("unit_price"), col("total_price"),
        col("category_id"), col("subcategory_id"), col("brand_id"),
        col("review_score"), col("created_at"))
      .distinct()
  }

  // -------------------------------------------------------------- marts --

  /** ecom_marts/core/dim_customers.sql:1-58 — denormalized dim with the
    * 3/6-month activity bands; `today` injected for CURRENT_DATE. */
  def dimCustomers(customersEnriched: DataFrame, locations: DataFrame,
      educationTypes: DataFrame, maritalStatuses: DataFrame,
      ordersInt: DataFrame, today: Date, now: Timestamp): DataFrame = {
    val o = ordersInt.groupBy("customer_id").agg(
      countDistinct(col("order_id")).as("total_orders"),
      sum(col("total_amount")).as("total_spent"),
      min(col("order_date")).as("first_order_date"),
      max(col("order_date")).as("last_order_date"))
    val t = lit(today)
    customersEnriched.drop("total_orders", "total_spent", "first_order_date", "last_order_date")
      .join(locations.select("location_id", "city", "state", "country"), Seq("location_id"), "left")
      .join(educationTypes.select("education_id", "education_type"), Seq("education_id"), "left")
      .join(maritalStatuses.select("marital_status_id", "status_type"), Seq("marital_status_id"), "left")
      .join(o, Seq("customer_id"), "left")
      .select(col("customer_id"), col("email"), col("first_name"), col("last_name"),
        col("age"), col("gender"), col("annual_income"),
        col("city"), col("state"), col("country"),
        col("education_type"), col("status_type").as("marital_status"),
        coalesce(col("total_orders"), lit(0)).as("total_orders"),
        coalesce(col("total_spent"), lit(0)).as("total_spent"),
        coalesce(F.safeDiv(col("total_spent"), col("total_orders")), lit(0)).as("avg_order_value"),
        col("first_order_date"), col("last_order_date"),
        when(col("last_order_date") >= add_months(t, -3), lit("Active"))
          .when(col("last_order_date") >= add_months(t, -6), lit("At Risk"))
          .otherwise(lit("Churned")).as("customer_status"),
        datediff(t, coalesce(col("first_order_date"), col("signup_date")).cast("date"))
          .as("customer_lifetime_days"),
        col("signup_date"), col("last_login"), col("is_active"),
        col("created_at"), lit(now).as("updated_at"))
  }

  /** ecom_marts/sales/fct_sales_by_date.sql:1-17. */
  def fctSalesByDate(ordersInt: DataFrame, now: Timestamp): DataFrame =
    ordersInt
      .groupBy(expr("try_cast(order_date AS DATE)").as("sale_date"))
      .agg(countDistinct(col("order_id")).as("total_orders"),
        countDistinct(col("customer_id")).as("unique_customers"),
        sum(col("total_amount")).as("total_revenue"),
        sum(col("shipping_cost")).as("total_shipping"),
        (sum(col("total_amount")) - sum(col("shipping_cost"))).as("net_revenue"),
        avg(col("total_amount")).as("avg_order_value"),
        (sum(col("total_amount")) / countDistinct(col("customer_id"))).as("revenue_per_customer"))
      .withColumn("updated_at", lit(now))

  /** ecom_marts/customer/fct_customer_orders.sql — per-customer order
    * metrics (the incremental mart; high-watermark handled by ModelGraph's
    * Incremental materialization when run against a store). */
  def fctCustomerOrders(ordersInt: DataFrame, now: Timestamp): DataFrame =
    ordersInt.groupBy(col("customer_id"))
      .agg(countDistinct(col("order_id")).as("total_orders"),
        sum(col("total_amount")).as("total_spent"),
        avg(col("total_amount")).as("avg_order_value"),
        max(col("order_date")).as("last_order_date"))
      .withColumn("updated_at", lit(now))

  // -------------------------------------------------------------- graph --

  /** The full DAG, raw sources → marts, for ModelGraph.compose/run.
    * Source names: raw_customers, raw_orders, raw_order_items,
    * raw_products, raw_reviews, raw_categories, raw_subcategories,
    * raw_interactions. */
  def models(now: Timestamp, today: Date): Seq[Model] = Seq(
    Model("stg_customers", Seq("raw_customers"), d => stgCustomers(d("raw_customers"))),
    Model("stg_orders", Seq("raw_orders"), d => stgOrders(d("raw_orders"))),
    Model("stg_order_items", Seq("raw_order_items"), d => stgOrderItems(d("raw_order_items"))),
    Model("stg_products", Seq("raw_products"), d => stgProducts(d("raw_products"))),
    Model("stg_reviews", Seq("raw_reviews"), d => stgReviews(d("raw_reviews"))),
    Model("stg_categories", Seq("raw_categories"), d => stgCategories(d("raw_categories"))),
    Model("stg_subcategories", Seq("raw_subcategories"), d => stgSubcategories(d("raw_subcategories"))),
    Model("stg_interactions", Seq("raw_interactions"), d => stgInteractions(d("raw_interactions"))),
    Model("education_types", Seq("stg_customers"), d => educationTypes(d("stg_customers"), now), Table),
    Model("marital_statuses", Seq("stg_customers"), d => maritalStatuses(d("stg_customers"), now), Table),
    Model("order_statuses", Seq("stg_orders"), d => orderStatuses(d("stg_orders"), now), Table),
    Model("payment_methods", Seq("stg_orders"), d => paymentMethods(d("stg_orders"), now), Table),
    Model("brands", Seq("stg_products"), d => brands(d("stg_products"), now), Table),
    Model("locations", Seq("stg_orders", "stg_customers"),
      d => locations(d("stg_orders"), d("stg_customers"), now), Table),
    Model("addresses", Seq("stg_orders", "locations"),
      d => addresses(d("stg_orders"), d("locations"), now), Table),
    Model("customers_enriched", Seq("stg_customers", "stg_orders", "education_types",
      "marital_statuses", "locations"),
      d => customersEnriched(d("stg_customers"), d("stg_orders"), d("education_types"),
        d("marital_statuses"), d("locations")), Table),
    Model("products_enriched", Seq("stg_products", "stg_order_items", "stg_reviews", "brands"),
      d => productsEnriched(d("stg_products"), d("stg_order_items"), d("stg_reviews"),
        d("brands")), Table),
    Model("orders", Seq("stg_orders", "order_statuses", "payment_methods", "addresses",
      "stg_order_items", "stg_reviews"),
      d => ordersInt(d("stg_orders"), d("order_statuses"), d("payment_methods"),
        d("addresses"), d("stg_order_items"), d("stg_reviews")), Table),
    Model("order_items", Seq("stg_order_items", "stg_orders", "products_enriched", "stg_reviews"),
      d => orderItemsInt(d("stg_order_items"), d("stg_orders"), d("products_enriched"),
        d("stg_reviews")), Table),
    Model("dim_customers", Seq("customers_enriched", "locations", "education_types",
      "marital_statuses", "orders"),
      d => dimCustomers(d("customers_enriched"), d("locations"), d("education_types"),
        d("marital_statuses"), d("orders"), today, now)),
    Model("fct_sales_by_date", Seq("orders"), d => fctSalesByDate(d("orders"), now), Table),
    Model("fct_customer_orders", Seq("orders"), d => fctCustomerOrders(d("orders"), now), Table)
  )
}
