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
    ("DESCRIPTION", "description", "string"),
    ("BASE_PRICE", "base_price", "decimal(12,2)"), ("SALE_PRICE", "sale_price", "decimal(12,2)"),
    ("STOCK_QUANTITY", "stock_quantity", "int"), ("WEIGHT_KG", "weight_kg", "decimal(8,2)"),
    ("BRAND", "brand", "string"),
    ("RATING", "rating", "decimal(3,1)"), ("IS_ACTIVE", "is_active", "boolean"),
    ("CREATED_AT", "created_at", "timestamp"))

  def stgReviews(raw: DataFrame): DataFrame = cast(raw,
    ("REVIEW_ID", "review_id", "string"), ("PRODUCT_ID", "product_id", "string"),
    ("ORDER_ID", "order_id", "string"), ("CUSTOMER_ID", "customer_id", "string"),
    ("REVIEW_SCORE", "review_score", "int"), ("REVIEW_TEXT", "review_text", "string"),
    ("LOADED_AT", "loaded_at", "timestamp"))

  def stgCategories(raw: DataFrame): DataFrame = cast(raw,
    ("CATEGORY_ID", "category_id", "string"), ("CATEGORY_NAME", "category_name", "string"),
    ("CREATED_AT", "created_at", "timestamp"))

  def stgSubcategories(raw: DataFrame): DataFrame = cast(raw,
    ("SUBCATEGORY_ID", "subcategory_id", "string"), ("CATEGORY_ID", "category_id", "string"),
    ("SUBCATEGORY_NAME", "subcategory_name", "string"),
    ("CREATED_AT", "created_at", "timestamp"))

  def stgInteractions(raw: DataFrame): DataFrame = cast(raw,
    ("EVENT_ID", "event_id", "string"), ("CUSTOMER_ID", "customer_id", "string"),
    ("PRODUCT_ID", "product_id", "string"), ("EVENT_TYPE", "event_type", "string"),
    ("EVENT_DATE", "event_date", "timestamp"), ("DEVICE_TYPE", "device_type", "string"),
    ("SESSION_ID", "session_id", "string"), ("CREATED_AT", "created_at", "timestamp"))

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

  /** entities/products_enriched.sql:72-132 — brand join ON expression
    * TRIM(brand) = brand_name (J4), order and review aggregates, NOT NULL
    * PK filter. Reference column list at :100-117 reproduced 1:1.
    *
    * Two reference no-ops are folded, not translated literally: the
    * `all_brands` CTE (:91-98) is the same DISTINCT TRIM(brand) set as the
    * `brands` model, so `COALESCE(b.brand_id, ab.brand_id)` (:109) always
    * resolves to the first operand — one broadcast join instead of two; and
    * the category/subcategory joins (:123-127) contribute no columns and
    * cannot multiply rows (unique join keys), so they are dropped. */
  def productsEnriched(stgProducts: DataFrame, stgOrderItems: DataFrame,
      stgReviews: DataFrame, brands: DataFrame): DataFrame = {
    val orderAgg = stgOrderItems.groupBy("product_id").agg(
      countDistinct(col("order_id")).as("total_orders"),
      sum(col("quantity")).as("total_quantity_sold"),
      sum(col("total_price")).as("total_revenue"))
    val reviewAgg = stgReviews.groupBy("product_id").agg(
      count(lit(1)).as("review_count"),
      avg(col("review_score")).as("avg_review_score"))
    val b = brands.select(col("brand_id"), col("brand_name"))
    stgProducts.filter(col("product_id").isNotNull)
      .join(b, trim(stgProducts("brand")) === b("brand_name"), "left")
      .join(orderAgg, Seq("product_id"), "left")
      .join(reviewAgg, Seq("product_id"), "left")
      .select(col("product_id"), col("product_name"), col("description"),
        col("base_price"), col("sale_price"), col("stock_quantity"),
        col("weight_kg"), col("is_active"), col("brand_id"),
        col("category_id"), col("subcategory_id"),
        coalesce(col("total_orders"), lit(0)).as("total_orders"),
        coalesce(col("total_quantity_sold"), lit(0)).as("total_quantity_sold"),
        coalesce(col("total_revenue"), lit(0)).as("total_revenue"),
        coalesce(col("review_count"), lit(0)).as("review_count"),
        col("avg_review_score"), col("created_at"))
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

  /** entities/categories_enriched.sql:1-12 — category rollup counting its
    * subcategories and products. Both joins key on category_id, so the raw
    * join fans out |subcats|×|products| per category; the COUNT(DISTINCT)s
    * collapse it. Inputs are projected to the two counted key columns
    * before the join so the fan-out carries 2 narrow columns, not whole
    * rows. */
  def categoriesEnriched(stgCategories: DataFrame, stgSubcategories: DataFrame,
      stgProducts: DataFrame): DataFrame = {
    val s = stgSubcategories.select(col("category_id"),
      col("subcategory_id").as("s_subcategory_id"))
    val p = stgProducts.select(col("category_id"),
      col("product_id").as("p_product_id"))
    stgCategories
      .join(s, Seq("category_id"), "left")
      .join(p, Seq("category_id"), "left")
      .groupBy(col("category_id"), col("category_name"), col("created_at"))
      .agg(countDistinct(col("s_subcategory_id")).as("subcategory_count"),
        countDistinct(col("p_product_id")).as("product_count"))
      .select(col("category_id"), col("category_name"),
        col("subcategory_count"), col("product_count"), col("created_at"))
  }

  /** entities/subcategories_enriched.sql:1-9 — per-subcategory product
    * count (join on subcategory_id only, as the reference does). */
  def subcategoriesEnriched(stgSubcategories: DataFrame,
      stgProducts: DataFrame): DataFrame =
    stgSubcategories
      .join(stgProducts.select(col("subcategory_id"), col("product_id")),
        Seq("subcategory_id"), "left")
      .groupBy(col("subcategory_id"), col("subcategory_name"),
        col("category_id"), col("created_at"))
      .agg(countDistinct(col("product_id")).as("product_count"))
      .select(col("subcategory_id"), col("subcategory_name"), col("category_id"),
        col("product_count"), col("created_at"))

  /** entities/reviews_enriched.sql:1-17 — review denormalized with product,
    * category, subcategory and brand names (J5 4-way left-join chain). The
    * three name dims are small — Catalyst broadcasts them; the
    * products_enriched join shuffles on product_id. */
  def reviewsEnriched(stgReviews: DataFrame, productsEnriched: DataFrame,
      categoriesEnriched: DataFrame, subcategoriesEnriched: DataFrame,
      brands: DataFrame): DataFrame = {
    val p = productsEnriched.select(col("product_id"), col("product_name"),
      col("category_id").as("p_category_id"),
      col("subcategory_id").as("p_subcategory_id"),
      col("brand_id").as("p_brand_id"))
    stgReviews
      .join(p, Seq("product_id"), "left")
      .join(categoriesEnriched.select(col("category_id").as("p_category_id"),
        col("category_name")), Seq("p_category_id"), "left")
      .join(subcategoriesEnriched.select(col("subcategory_id").as("p_subcategory_id"),
        col("subcategory_name")), Seq("p_subcategory_id"), "left")
      .join(brands.select(col("brand_id").as("p_brand_id"), col("brand_name")),
        Seq("p_brand_id"), "left")
      .select(col("review_id"), col("product_id"), col("order_id"),
        col("customer_id"), col("review_score"), col("review_text"),
        col("product_name"), col("category_name"), col("subcategory_name"),
        col("brand_name"), col("loaded_at").as("created_at"))
  }

  /** transactions/customer_interactions.sql:1-14 — interactions ⟕ products
    * (J6): events annotated with the product's category/subcategory. */
  def customerInteractions(stgInteractions: DataFrame,
      stgProducts: DataFrame): DataFrame =
    stgInteractions
      .join(stgProducts.select(col("product_id"), col("category_id"),
        col("subcategory_id")), Seq("product_id"), "left")
      .select(col("event_id"), col("customer_id"), col("product_id"),
        col("category_id"), col("subcategory_id"), col("event_type"),
        col("event_date"), col("device_type"), col("session_id"),
        col("created_at"))

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
        coalesce(F.safeDiv(col("total_spent").cast("double"), col("total_orders")), lit(0))
          .as("avg_order_value"),
        col("first_order_date"), col("last_order_date"),
        when(col("last_order_date") >= add_months(t, -3), lit("Active"))
          .when(col("last_order_date") >= add_months(t, -6), lit("At Risk"))
          .otherwise(lit("Churned")).as("customer_status"),
        datediff(t, coalesce(col("first_order_date"), col("signup_date")).cast("date"))
          .as("customer_lifetime_days"),
        col("signup_date"), col("last_login"), col("is_active"),
        col("created_at"), lit(now).as("updated_at"))
  }

  /** ecom_marts/sales/fct_sales_by_date.sql:1-17. Ratio columns use the
    * portable-average form (exact decimal SUM → double ÷ count) so the same
    * value reproduces on any engine; plain AVG over DECIMAL is
    * precision-scheme-specific (SURVEY §7.4 #4). */
  def fctSalesByDate(ordersInt: DataFrame, now: Timestamp): DataFrame =
    ordersInt
      .groupBy(expr("try_cast(order_date AS DATE)").as("sale_date"))
      .agg(countDistinct(col("order_id")).as("total_orders"),
        countDistinct(col("customer_id")).as("unique_customers"),
        sum(col("total_amount")).as("total_revenue"),
        sum(col("shipping_cost")).as("total_shipping"),
        (sum(col("total_amount")) - sum(col("shipping_cost"))).as("net_revenue"),
        (sum(col("total_amount")).cast("double") / count(col("total_amount")))
          .as("avg_order_value"),
        (sum(col("total_amount")).cast("double") / countDistinct(col("customer_id")))
          .as("revenue_per_customer"))
      .withColumn("updated_at", lit(now))

  /** ecom_marts/customer/fct_customer_orders.sql:6-21 — PER-ORDER grain
    * (GROUP BY customer, order, date, amount) with item/review rollups.
    * This is the reference's functional incremental mart: `order_date` is
    * both selected and the high-watermark column (:18-20), so
    * [[graft.plans.ModelGraph.Incremental]] appends exactly the new orders.
    *
    * Faithfully ported fan-out: reviews join on order_id alone (:17), so an
    * order with k reviews repeats its items k times — total_items is
    * k-inflated and avg_review_score is item-weighted, exactly as the
    * reference computes them. */
  def fctCustomerOrders(ordersInt: DataFrame, orderItemsInt: DataFrame,
      reviewsEnriched: DataFrame): DataFrame =
    ordersInt.select(col("customer_id"), col("order_id"), col("order_date"),
        col("total_amount"))
      .join(orderItemsInt.select(col("order_id"), col("product_id"),
        col("quantity")), Seq("order_id"), "left")
      .join(reviewsEnriched.select(col("order_id"), col("review_score")),
        Seq("order_id"), "left")
      .groupBy(col("customer_id"), col("order_id"), col("order_date"),
        col("total_amount"))
      .agg(countDistinct(col("product_id")).as("unique_products"),
        sum(col("quantity")).as("total_items"),
        avg(col("review_score")).as("avg_review_score"))
      .select(col("customer_id"), col("order_id"), col("order_date"),
        col("total_amount"), col("unique_products"), col("total_items"),
        (col("total_amount").cast("double") /
          F.nullIf(col("unique_products"), lit(0))).as("avg_order_value"),
        col("avg_review_score"))

  /** ecom_marts/core/dim_products.sql:6-26 — product dim denormalized with
    * category/subcategory/brand names. Note the reference selects
    * c.category_id (:8), not p's — NULL when the category dim misses. */
  def dimProducts(productsEnriched: DataFrame, categoriesEnriched: DataFrame,
      subcategoriesEnriched: DataFrame, brands: DataFrame, now: Timestamp): DataFrame =
    productsEnriched
      .join(categoriesEnriched.select(col("category_id").as("c_category_id"),
        col("category_name")), col("category_id") === col("c_category_id"), "left")
      .join(subcategoriesEnriched.select(col("subcategory_id").as("s_subcategory_id"),
        col("subcategory_name")), col("subcategory_id") === col("s_subcategory_id"), "left")
      .join(brands.select(col("brand_id").as("b_brand_id"), col("brand_name")),
        col("brand_id") === col("b_brand_id"), "left")
      .select(col("product_id"), col("c_category_id").as("category_id"),
        col("product_name"), col("description"), col("base_price"),
        col("sale_price"), col("stock_quantity"), col("category_name"),
        col("subcategory_name"), col("brand_name"), col("is_active"),
        col("created_at"), lit(now).as("updated_at"))

  /** ecom_marts/core/dim_categories.sql:7-27 — category with its ordered,
    * distinct subcategory list (A8 LISTAGG WITHIN GROUP port:
    * sort_array(collect_set) ≡ STRING_AGG(DISTINCT … ORDER BY …); an empty
    * group yields NULL, matching STRING_AGG over no rows). */
  def dimCategories(categoriesEnriched: DataFrame,
      subcategoriesEnriched: DataFrame): DataFrame = {
    val hierarchy = categoriesEnriched.select(col("category_id"))
      .join(subcategoriesEnriched.select(col("category_id"), col("subcategory_name")),
        Seq("category_id"), "left")
      .groupBy(col("category_id"))
      .agg(collect_set(col("subcategory_name")).as("subs"))
      .select(col("category_id"),
        when(size(col("subs")) === 0, lit(null).cast("string"))
          .otherwise(array_join(array_sort(col("subs")), ", ")).as("subcategories"))
    categoriesEnriched
      .join(hierarchy, Seq("category_id"), "left")
      .select(col("category_id"), col("category_name"), col("subcategories"),
        col("created_at"))
  }

  /** ecom_marts/core/dim_locations.sql:6-14 — the reference left-joins
    * customers and orders purely as row multipliers and GROUP BYs all four
    * selected columns; GROUP BY with no aggregates ≡ DISTINCT, and left
    * joins cannot drop location rows, so the join chain is kept for model
    * fidelity and deduped exactly as the reference does. */
  def dimLocations(locations: DataFrame, customersEnriched: DataFrame,
      ordersInt: DataFrame): DataFrame =
    locations.select(col("location_id"), col("city"), col("state"), col("country"))
      .join(customersEnriched.select(col("location_id"), col("customer_id")),
        Seq("location_id"), "left")
      .join(ordersInt.select(col("customer_id")), Seq("customer_id"), "left")
      .select(col("location_id"), col("city"), col("state"), col("country"))
      .distinct()

  /** ecom_marts/core/dim_dates.sql:6-19 — date spine from the union of
    * order and interaction timestamps with calendar attributes; DOW uses
    * the DuckDB numbering (Sunday=0, [[F.dowSundayZero]]). */
  def dimDates(ordersInt: DataFrame, customerInteractions: DataFrame): DataFrame =
    ordersInt.select(col("order_date").as("date_day"))
      .union(customerInteractions.select(col("event_date").as("date_day")))
      .distinct()
      .select(col("date_day"),
        year(col("date_day")).as("year"),
        month(col("date_day")).as("month"),
        F.dowSundayZero(col("date_day")).as("day_of_week"),
        date_trunc("month", col("date_day")).as("first_day_of_month"),
        last_day(col("date_day").cast("date")).as("last_day_of_month"))

  /** ecom_marts/sales/fct_order_details.sql:6-62 — the 9-way star flagship:
    * order items inner-joined to orders, customers, customer locations,
    * products, categories and brands, left-joined to statuses, payment
    * methods, (empty) addresses + shipping locations, and reviews on the
    * two-part (order, product) key. Dims broadcast; the fact-fact joins
    * shuffle on their keys. */
  def fctOrderDetails(ordersInt: DataFrame, orderItemsInt: DataFrame,
      customersEnriched: DataFrame, locations: DataFrame,
      productsEnriched: DataFrame, categoriesEnriched: DataFrame,
      brands: DataFrame, orderStatuses: DataFrame, paymentMethods: DataFrame,
      addresses: DataFrame, reviewsEnriched: DataFrame, now: Timestamp): DataFrame = {
    val o = ordersInt.select(col("order_id"), col("order_date"),
      col("customer_id"), col("status_id"), col("payment_method_id"),
      col("shipping_address_id"), col("shipping_cost"),
      col("total_amount").as("order_total"), col("created_at"))
    val oi = orderItemsInt.select(col("order_id"), col("product_id"),
      col("quantity"), col("unit_price"), col("total_price").as("item_total"))
    val c = customersEnriched.select(col("customer_id"), col("email"),
      col("location_id").as("c_location_id"))
    val lc = locations.select(col("location_id").as("c_location_id"),
      col("city").as("customer_city"), col("state").as("customer_state"))
    val p = productsEnriched.select(col("product_id"), col("product_name"),
      col("category_id").as("p_category_id"), col("brand_id").as("p_brand_id"))
    val ca = categoriesEnriched.select(col("category_id").as("p_category_id"),
      col("category_name"))
    val b = brands.select(col("brand_id").as("p_brand_id"), col("brand_name"))
    val os = orderStatuses.select(col("status_id"), col("status_name"))
    val pm = paymentMethods.select(col("payment_method_id"),
      col("method_name").as("payment_method"))
    val sa = addresses.select(col("address_id").as("shipping_address_id"),
      col("street_address").as("shipping_address"),
      col("location_id").as("sa_location_id"))
    val ls = locations.select(col("location_id").as("sa_location_id"),
      col("city").as("shipping_city"), col("state").as("shipping_state"))
    val r = reviewsEnriched.select(col("order_id"), col("product_id"),
      col("review_score"))
    o.join(oi, Seq("order_id"))
      .join(c, Seq("customer_id"))
      .join(lc, Seq("c_location_id"))
      .join(p, Seq("product_id"))
      .join(ca, Seq("p_category_id"))
      .join(b, Seq("p_brand_id"))
      .join(os, Seq("status_id"), "left")
      .join(pm, Seq("payment_method_id"), "left")
      .join(sa, Seq("shipping_address_id"), "left")
      .join(ls, Seq("sa_location_id"), "left")
      .join(r, Seq("order_id", "product_id"), "left")
      .select(col("order_id"), col("order_date"), col("customer_id"),
        col("email"), col("customer_city"), col("customer_state"),
        col("product_id"), col("product_name"), col("category_name"),
        col("brand_name"), col("status_name"), col("payment_method"),
        col("shipping_address"), col("shipping_city"), col("shipping_state"),
        col("quantity"), col("unit_price"), col("item_total"),
        col("shipping_cost"), col("order_total"), col("review_score"),
        col("created_at"), lit(now).as("updated_at"))
  }

  /** ecom_marts/customer/fct_customer_activity.sql:6-36 — per customer ×
    * month interaction rollup. The WHERE on CAST(event_date AS DATE)
    * IS NOT NULL (:32) silently turns the left join inner — ported as
    * written. */
  def fctCustomerActivity(customersEnriched: DataFrame,
      customerInteractions: DataFrame, now: Timestamp): DataFrame =
    customersEnriched.select(col("customer_id"), col("email"))
      .join(customerInteractions.select(col("customer_id"), col("product_id"),
        col("event_type"), col("event_date"), col("session_id"),
        col("device_type")), Seq("customer_id"), "left")
      .filter(col("event_date").cast("date").isNotNull)
      .groupBy(col("customer_id"), col("email"),
        trunc(col("event_date").cast("date"), "month").as("activity_month"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("total_views"),
        countDistinct(when(col("event_type") === "view", col("product_id")))
          .as("unique_products_viewed"),
        count(when(col("event_type") === "cart_add", 1)).as("cart_adds"),
        countDistinct(when(col("event_type") === "cart_add", col("product_id")))
          .as("unique_products_added"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        countDistinct(when(col("event_type") === "purchase", col("product_id")))
          .as("unique_products_purchased"),
        countDistinct(col("session_id")).as("total_sessions"),
        countDistinct(col("device_type")).as("devices_used"))
      .withColumn("updated_at", lit(now))

  /** ecom_marts/customer/fct_customer_reviews.sql:6-15 — reviews with the
    * product's category keys, incremental on r.created_at (:16-18). The
    * reference's own watermark can never fire — it filters on created_at
    * but does not SELECT it, so {{this}} has no created_at column (a
    * reference bug). Carrying created_at into the output makes the declared
    * incremental contract actually functional; the mart grain is per
    * review, and the products join is review-local, so rows past the
    * watermark are complete on their own. */
  def fctCustomerReviews(reviewsEnriched: DataFrame,
      productsEnriched: DataFrame): DataFrame =
    reviewsEnriched.select(col("product_id"), col("customer_id"),
        col("order_id"), col("review_score"), col("review_text"),
        col("created_at"))
      .join(productsEnriched.select(col("product_id"), col("category_id"),
        col("subcategory_id")), Seq("product_id"))
      .select(col("customer_id"), col("product_id"), col("order_id"),
        col("review_score"), col("review_text"), col("category_id"),
        col("subcategory_id"), col("created_at"))

  /** ecom_marts/sales/fct_product_performance.sql:6-18 — product × month
    * sales/review rollup. Left-join chain keeps never-sold products (NULL
    * month); the reviews join on product_id alone fans out across that
    * product's order items (reference semantics, kept — units/revenue are
    * review-count-inflated as the dbt model computes them). review_count
    * is COUNT(DISTINCT review_score) — distinct scores, as written (:13).
    *
    * CLOSED-FORM FAN-OUT (r12): materializing the items × reviews product
    * fan-out is QUADRATIC PER PRODUCT — on the Zipf skew corpus the hub
    * part holds ~7 % of both order items and reviews, so at skew1 one
    * product's join group is ~4·10⁵ × 3·10⁵ ≈ 10¹¹ rows through a single
    * reducer and the model never finished deriving. The fan-out's
    * aggregate is computable without the pair table: within a
    * (product, month) group every item row repeats once per review row of
    * the product, so units/revenue scale by the product's review-ROW
    * count, distinct counts are unaffected, and AVG(score) is the plain
    * review mean (the item replication factor cancels exactly — the same
    * real quotient rounds to the same double, since both are ratios of
    * exactly-representable integer sums). Two hash aggregates + one
    * product-grain join replace the 10¹¹-row group; bit-identical to the
    * fan-out (the DuckDB oracle still replays the literal fan-out).
    *
    * PRECONDITION (ADVICE r12, same style as a_regr_fit's 10³⁸ bound):
    * the cancellation argument needs the fan-out's replicated double sums
    * to stay ≤ 2⁵³ — scores are 1..5 and items-per-(product,month) ×
    * reviews-per-product would have to exceed ~1.8·10¹⁵ pair rows in ONE
    * group before Σscore loses a ulp; the graded corpora top out at
    * ~10¹¹ (skew1's hub product), 4 orders of magnitude under the bound. */
  def fctProductPerformance(productsEnriched: DataFrame, orderItemsInt: DataFrame,
      ordersInt: DataFrame, reviewsEnriched: DataFrame): DataFrame = {
    val items = productsEnriched.select(col("product_id"))
      .join(orderItemsInt.select(col("product_id"), col("order_id"),
        col("quantity"), col("total_price")), Seq("product_id"), "left")
      .join(ordersInt.select(col("order_id"), col("order_date")),
        Seq("order_id"), "left")
      .groupBy(col("product_id"),
        date_trunc("month", col("order_date")).as("month"))
      .agg(countDistinct(col("order_id")).as("total_orders"),
        sum(col("quantity")).as("units_raw"),
        sum(col("total_price")).as("rev_raw"))
    // n_rows is the replication factor (every review row replicates each
    // item row, null scores included); n_scored/score_sum feed the mean
    // exactly as AVG skips nulls in the fan-out
    val revs = reviewsEnriched.groupBy(col("product_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("review_score")).as("n_scored"),
        sum(col("review_score")).as("score_sum"),
        countDistinct(col("review_score")).as("review_count"))
    items.join(revs, Seq("product_id"), "left")
      .select(col("product_id"), col("month"),
        col("total_orders"),
        when(col("n_rows").isNotNull, col("units_raw") * col("n_rows"))
          .otherwise(col("units_raw")).as("units_sold"),
        when(col("n_rows").isNotNull, col("rev_raw") * col("n_rows"))
          .otherwise(col("rev_raw")).as("revenue"),
        when(col("n_scored") > 0,
          col("score_sum").cast("double") / col("n_scored").cast("double"))
          .as("avg_rating"),
        coalesce(col("review_count"), lit(0L)).as("review_count"))
  }

  /** ecom_marts/sales/fct_product_interactions.sql:6-14 — product × day
    * event-type counts over customer_interactions. */
  def fctProductInteractions(customerInteractions: DataFrame): DataFrame =
    customerInteractions
      .groupBy(col("product_id"),
        date_trunc("day", col("event_date")).as("event_day"))
      .agg(
        countDistinct(when(col("event_type") === "view", col("event_id")))
          .as("views"),
        countDistinct(when(col("event_type") === "cart_add", col("event_id")))
          .as("cart_adds"),
        countDistinct(when(col("event_type") === "wishlist_add", col("event_id")))
          .as("wishlist_adds"),
        countDistinct(col("customer_id")).as("unique_customers"))

  /** ecom_marts/sales/fct_sales_by_product.sql:6-17 — product × month sales
    * (inner joins: only sold products). avg_selling_price uses the portable
    * exact-sum/count form of AVG(unit_price). */
  def fctSalesByProduct(productsEnriched: DataFrame, orderItemsInt: DataFrame,
      ordersInt: DataFrame): DataFrame =
    productsEnriched.select(col("product_id"), col("category_id"))
      .join(orderItemsInt.select(col("product_id"), col("order_id"),
        col("quantity"), col("unit_price"), col("total_price")),
        Seq("product_id"))
      .join(ordersInt.select(col("order_id"), col("order_date")), Seq("order_id"))
      .groupBy(col("product_id"), col("category_id"),
        date_trunc("month", col("order_date")).as("sales_month"))
      .agg(countDistinct(col("order_id")).as("total_orders"),
        sum(col("quantity")).as("units_sold"),
        sum(col("total_price")).as("revenue"),
        (sum(col("unit_price")).cast("double") / count(col("unit_price")))
          .as("avg_selling_price"))

  /** ecom_marts/sales/fct_sales_by_region.sql:6-17 — state/country × month
    * revenue through the customer→location chain (inner joins). */
  def fctSalesByRegion(ordersInt: DataFrame, customersEnriched: DataFrame,
      locations: DataFrame): DataFrame =
    ordersInt.select(col("customer_id"), col("order_id"), col("order_date"),
        col("total_amount"))
      .join(customersEnriched.select(col("customer_id"), col("location_id")),
        Seq("customer_id"))
      .join(locations.select(col("location_id"), col("state"), col("country")),
        Seq("location_id"))
      .groupBy(col("state"), col("country"),
        date_trunc("month", col("order_date")).as("sales_month"))
      .agg(countDistinct(col("order_id")).as("total_orders"),
        countDistinct(col("customer_id")).as("unique_customers"),
        sum(col("total_amount")).as("total_revenue"),
        (sum(col("total_amount")).cast("double") / count(col("total_amount")))
          .as("avg_order_value"))

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
    Model("categories_enriched", Seq("stg_categories", "stg_subcategories", "stg_products"),
      d => categoriesEnriched(d("stg_categories"), d("stg_subcategories"),
        d("stg_products")), Table),
    Model("subcategories_enriched", Seq("stg_subcategories", "stg_products"),
      d => subcategoriesEnriched(d("stg_subcategories"), d("stg_products")), Table),
    Model("reviews_enriched", Seq("stg_reviews", "products_enriched",
      "categories_enriched", "subcategories_enriched", "brands"),
      d => reviewsEnriched(d("stg_reviews"), d("products_enriched"),
        d("categories_enriched"), d("subcategories_enriched"), d("brands")), Table),
    Model("customer_interactions", Seq("stg_interactions", "stg_products"),
      d => customerInteractions(d("stg_interactions"), d("stg_products")), Table),
    // marts — dims are views, facts tables, per dbt_project.yml:19-30;
    // fct_customer_orders is the reference's one functional incremental
    // (customer/fct_customer_orders.sql:18-20 watermarks on order_date).
    Model("dim_customers", Seq("customers_enriched", "locations", "education_types",
      "marital_statuses", "orders"),
      d => dimCustomers(d("customers_enriched"), d("locations"), d("education_types"),
        d("marital_statuses"), d("orders"), today, now)),
    Model("dim_products", Seq("products_enriched", "categories_enriched",
      "subcategories_enriched", "brands"),
      d => dimProducts(d("products_enriched"), d("categories_enriched"),
        d("subcategories_enriched"), d("brands"), now)),
    Model("dim_categories", Seq("categories_enriched", "subcategories_enriched"),
      d => dimCategories(d("categories_enriched"), d("subcategories_enriched"))),
    Model("dim_locations", Seq("locations", "customers_enriched", "orders"),
      d => dimLocations(d("locations"), d("customers_enriched"), d("orders"))),
    Model("dim_dates", Seq("orders", "customer_interactions"),
      d => dimDates(d("orders"), d("customer_interactions"))),
    Model("fct_sales_by_date", Seq("orders"), d => fctSalesByDate(d("orders"), now), Table),
    Model("fct_customer_orders", Seq("orders", "order_items", "reviews_enriched"),
      d => fctCustomerOrders(d("orders"), d("order_items"), d("reviews_enriched")),
      ModelGraph.Incremental("order_date")),
    // fct_customer_activity is declared incremental by the reference
    // (fct_customer_activity.sql:2) at month grain — an aggregate, so the
    // store merges by replacing months at/past the watermark rather than
    // appending (the boundary month keeps accreting interactions).
    Model("fct_customer_activity", Seq("customers_enriched", "customer_interactions"),
      d => fctCustomerActivity(d("customers_enriched"), d("customer_interactions"), now),
      ModelGraph.IncrementalMerge("activity_month")),
    Model("fct_customer_reviews", Seq("reviews_enriched", "products_enriched"),
      d => fctCustomerReviews(d("reviews_enriched"), d("products_enriched")),
      ModelGraph.Incremental("created_at")),
    Model("fct_order_details", Seq("orders", "order_items", "customers_enriched",
      "locations", "products_enriched", "categories_enriched", "brands",
      "order_statuses", "payment_methods", "addresses", "reviews_enriched"),
      d => fctOrderDetails(d("orders"), d("order_items"), d("customers_enriched"),
        d("locations"), d("products_enriched"), d("categories_enriched"), d("brands"),
        d("order_statuses"), d("payment_methods"), d("addresses"),
        d("reviews_enriched"), now), Table),
    Model("fct_product_performance", Seq("products_enriched", "order_items",
      "orders", "reviews_enriched"),
      d => fctProductPerformance(d("products_enriched"), d("order_items"),
        d("orders"), d("reviews_enriched")), Table),
    Model("fct_product_interactions", Seq("customer_interactions"),
      d => fctProductInteractions(d("customer_interactions")), Table),
    Model("fct_sales_by_product", Seq("products_enriched", "order_items", "orders"),
      d => fctSalesByProduct(d("products_enriched"), d("order_items"), d("orders")), Table),
    Model("fct_sales_by_region", Seq("orders", "customers_enriched", "locations"),
      d => fctSalesByRegion(d("orders"), d("customers_enriched"), d("locations")), Table)
  )
}
