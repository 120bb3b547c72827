package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ecom.Ecom
import graft.operators.Quality
import graft.plans.ModelGraph

/** End-to-end medallion run over FIXTURES.md-shaped raw tables, asserting
  * the reference's observed behaviors — including the ⚠ quirk: comma-less
  * addresses ⇒ empty `addresses`, customer-only `locations`, NULL order
  * address FKs. */
class EcomPipelineSpec extends SparkSpec {

  private val now = Timestamp.valueOf("2025-01-15 00:00:00")
  private val today = Date.valueOf("2025-01-15")
  private def ts(s: String) = s // raw arrives as strings; staging casts

  private def raw: Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "raw_customers" -> Seq(
        ("C1", "ann@x.io", "Ann", "Lee", "34", "F", "82000.50", "Married", "Master",
          "Urban", "Berlin", "BE", "Germany", ts("2023-02-01 10:00:00"),
          ts("2025-01-10 09:00:00"), "Web", "true", ts("2024-06-01 00:00:00")),
        ("C2", "bo@x.io", "Bo", "Kim", "51", "M", "54000.00", "Single", "Bachelor",
          "Rural", "Munich", "BY", "Germany", ts("2022-07-15 08:00:00"),
          ts("2024-12-01 12:00:00"), "Mobile App", "true", ts("2024-06-01 00:00:00")),
        // blank city → excluded from customers_enriched and locations
        ("C3", "cy@x.io", "Cy", "Roe", "28", "Other", "39000.00", "Single", "PhD",
          "Urban", "  ", "HH", "Germany", ts("2024-01-01 00:00:00"),
          ts("2024-11-01 00:00:00"), "Email", "false", ts("2024-06-01 00:00:00")))
        .toDF("CUSTOMER_ID", "EMAIL", "FIRST_NAME", "LAST_NAME", "AGE", "GENDER",
          "ANNUAL_INCOME", "MARITAL_STATUS", "EDUCATION", "LOCATION_TYPE", "CITY",
          "STATE", "COUNTRY", "SIGNUP_DATE", "LAST_LOGIN", "PREFERRED_CHANNEL",
          "IS_ACTIVE", "LOADED_AT"),

      "raw_orders" -> Seq(
        // ⚠ addresses are street-only, NO COMMAS (FIXTURES.md)
        ("O1", "C1", ts("2024-12-20 10:00:00"), "Delivered", "120.00", "10.00",
          "Credit Card", "15493 Dunn Key Apt. 138", "15493 Dunn Key Apt. 138",
          ts("2024-12-20 10:00:00")),
        ("O2", "C1", ts("2024-05-05 09:00:00"), "Shipped", "80.00", "5.00",
          "PayPal", "7 Oak Street", "7 Oak Street", ts("2024-05-05 09:00:00")),
        ("O3", "C2", ts("2023-11-02 14:00:00"), "Pending", "200.00", "20.00",
          "Debit Card", "99 Pine Road", "99 Pine Road", ts("2023-11-02 14:00:00")))
        .toDF("ORDER_ID", "CUSTOMER_ID", "ORDER_DATE", "STATUS", "TOTAL_AMOUNT",
          "SHIPPING_COST", "PAYMENT_METHOD", "SHIPPING_ADDRESS", "BILLING_ADDRESS",
          "LOADED_AT"),

      "raw_order_items" -> Seq(
        ("I1", "O1", "P1", "2", "30.00", "60.00", ts("2024-12-20 10:00:00")),
        ("I2", "O1", "P2", "1", "60.00", "60.00", ts("2024-12-20 10:00:00")),
        ("I3", "O2", "P1", "1", "80.00", "80.00", ts("2024-05-05 09:00:00")),
        // orphan FK: product P9 doesn't exist → dropped by order_items (J7)
        ("I4", "O3", "P9", "1", "200.00", "200.00", ts("2023-11-02 14:00:00")))
        .toDF("ORDER_ITEM_ID", "ORDER_ID", "PRODUCT_ID", "QUANTITY", "UNIT_PRICE",
          "TOTAL_PRICE", "CREATED_AT"),

      "raw_products" -> Seq(
        ("P1", "1", "101", "Widget", "a widget", "35.00", "30.00", "10", "0.40",
          " Acme Corp ", "4.5", "true", ts("2023-01-01 00:00:00")),
        ("P2", "2", "201", "Gadget", "a gadget", "70.00", "60.00", "5", "1.20",
          "Acme Corp", "3.9", "true", ts("2023-02-01 00:00:00")))
        .toDF("PRODUCT_ID", "CATEGORY_ID", "SUBCATEGORY_ID", "PRODUCT_NAME",
          "DESCRIPTION", "BASE_PRICE", "SALE_PRICE", "STOCK_QUANTITY", "WEIGHT_KG",
          "BRAND", "RATING", "IS_ACTIVE", "CREATED_AT"),

      "raw_reviews" -> Seq(
        // two reviews for (O1, P1) with different LOADED_AT → latest (score 5) wins (W1)
        ("R1", "P1", "O1", "C1", "2", "meh", ts("2024-12-21 00:00:00")),
        ("R2", "P1", "O1", "C1", "5", "great", ts("2024-12-25 00:00:00")),
        ("R3", "P2", "O1", "C1", "4", "good", ts("2024-12-22 00:00:00")))
        .toDF("REVIEW_ID", "PRODUCT_ID", "ORDER_ID", "CUSTOMER_ID", "REVIEW_SCORE",
          "REVIEW_TEXT", "LOADED_AT"),

      "raw_categories" -> Seq(
        ("1", "Electronics", ts("2022-01-01 00:00:00")),
        ("2", "Fashion", ts("2022-01-02 00:00:00")))
        .toDF("CATEGORY_ID", "CATEGORY_NAME", "CREATED_AT"),
      "raw_subcategories" -> Seq(
        ("101", "1", "Phones", ts("2022-02-01 00:00:00")),
        ("201", "2", "Shoes", ts("2022-02-02 00:00:00")))
        .toDF("SUBCATEGORY_ID", "CATEGORY_ID", "SUBCATEGORY_NAME", "CREATED_AT"),
      "raw_interactions" -> Seq(
        ("E1", "C1", "P1", "view", ts("2024-12-01 10:00:00"), "mobile", "session_1",
          ts("2024-12-01 10:00:00")))
        .toDF("EVENT_ID", "CUSTOMER_ID", "PRODUCT_ID", "EVENT_TYPE", "EVENT_DATE",
          "DEVICE_TYPE", "SESSION_ID", "CREATED_AT"))
  }

  // Materialized once: assertions over the composed lazy DAG would re-run
  // Catalyst analysis of the full 22-model plan per action (~7 min suite);
  // run() writes Table models to parquet so each assertion reads a flat scan.
  private lazy val out: Map[String, DataFrame] = {
    val dir = java.nio.file.Files.createTempDirectory("ecom_out").toString
    ModelGraph.run(spark, Ecom.models(now, today), raw, dir)
  }

  test("the empty-addresses quirk holds: comma-less addresses parse blank") {
    assert(out("addresses").count() == 0)
  }

  test("locations populate from customers only; blank city row excluded") {
    import spark.implicits._
    val locs = out("locations").select("city", "state").as[(String, String)]
      .collect().toSet
    assert(locs == Set(("Berlin", "BE"), ("Munich", "BY")))
  }

  test("orders: address FKs NULL, lookups resolve, review aggregates correct") {
    import spark.implicits._
    val o = out("orders")
    assert(o.filter($"shipping_address_id".isNotNull || $"billing_address_id".isNotNull).count() == 0)
    assert(o.filter($"status_id".isNull || $"payment_method_id".isNull).count() == 0)
    val o1 = o.filter($"order_id" === "O1").head()
    assert(o1.getAs[Boolean]("has_review"))
    assert(o1.getAs[Long]("unique_products") == 2)
    val o3 = o.filter($"order_id" === "O3").head()
    assert(!o3.getAs[Boolean]("has_review"))
  }

  test("order_items: orphan product dropped, latest review score wins") {
    import spark.implicits._
    val oi = out("order_items")
    assert(oi.filter($"order_item_id" === "I4").count() == 0) // J7 existence filter
    val i1 = oi.filter($"order_item_id" === "I1").head()
    assert(i1.getAs[Int]("review_score") == 5) // W1 keep-latest
    assert(i1.getAs[String]("category_id") == "1")
    assert(oi.count() == 3)
  }

  test("dim_customers: activity bands and lifetime days from injected clock") {
    import spark.implicits._
    val dc = out("dim_customers")
    val c1 = dc.filter($"customer_id" === "C1").head()
    assert(c1.getAs[String]("customer_status") == "Active") // ordered 2024-12-20
    val c2 = dc.filter($"customer_id" === "C2").head()
    assert(c2.getAs[String]("customer_status") == "Churned") // 2023-11-02
    assert(c1.getAs[String]("city") == "Berlin")
    assert(dc.filter($"customer_id" === "C3").count() == 0) // blank city excluded
  }

  test("fct_sales_by_date aggregates per day") {
    import spark.implicits._
    val f = out("fct_sales_by_date")
    assert(f.count() == 3)
    val d1 = f.filter($"sale_date" === Date.valueOf("2024-12-20")).head()
    assert(d1.getAs[Long]("total_orders") == 1)
    assert(d1.getAs[java.math.BigDecimal]("total_revenue").doubleValue() == 120.0)
  }

  test("quality gates pass on pipeline outputs (dbt schema.yml parity)") {
    val checks = Seq(
      "orders_pk_unique" -> Quality.unique(out("orders"), Seq("order_id")),
      "order_items_pk_unique" -> Quality.unique(out("order_items"), Seq("order_item_id")),
      "dim_customers_pk_unique" -> Quality.unique(out("dim_customers"), Seq("customer_id")),
      "orders_customer_fk" -> Quality.relationship(
        out("orders"), "customer_id", out("customers_enriched"), "customer_id"),
      "order_items_product_fk" -> Quality.relationship(
        out("order_items"), "product_id", out("products_enriched"), "product_id"))
    val failures = Quality.run(checks).filter(_.failures > 0)
    assert(failures.isEmpty, s"failing checks: $failures")
  }

  test("staging is row-preserving (the qa oracle's src->stg premise)") {
    // the qa_schema_tests oracle resolves source-tier checks to the stg_*
    // CTEs; that is sound only while staging is a pure 1:1 cast projection
    val raw = graft.ecom.EcomFixture.raw(spark, sfDir)
    val stg = Map(
      "raw_customers" -> Ecom.stgCustomers(raw("raw_customers")),
      "raw_orders" -> Ecom.stgOrders(raw("raw_orders")),
      "raw_order_items" -> Ecom.stgOrderItems(raw("raw_order_items")),
      "raw_products" -> Ecom.stgProducts(raw("raw_products")),
      "raw_reviews" -> Ecom.stgReviews(raw("raw_reviews")),
      "raw_categories" -> Ecom.stgCategories(raw("raw_categories")),
      "raw_subcategories" -> Ecom.stgSubcategories(raw("raw_subcategories")),
      "raw_interactions" -> Ecom.stgInteractions(raw("raw_interactions")))
    stg.foreach { case (name, s) =>
      assert(s.count() == raw(name).count(), s"$name staging dropped/added rows")
    }
  }

  test("schema-test matrix store_failures persists each failing-row set") {
    import graft.ecom.EcomSchemaTests
    val dir = java.nio.file.Files.createTempDirectory("qa_fail").toString
    // a tiny two-check slice of the machinery: one passing, one failing
    val dup = out("order_items")
    val results = graft.operators.Quality.run(Seq(
      "unique__order_items__order_item_id" ->
        graft.operators.Quality.unique(dup, Seq("order_item_id")),
      "not_null__orders__order_id" ->
        graft.operators.Quality.notNull(out("orders"), "order_id")),
      Some(dir))
    val byName = results.map(r => r.name -> r.failures).toMap
    assert(byName("not_null__orders__order_id") == 0)
    // failing sets persist under failuresPath/<test_name>; passing ones don't
    results.filter(_.failures > 0).foreach { r =>
      assert(new java.io.File(s"$dir/${r.name}").exists())
    }
    assert(!new java.io.File(s"$dir/not_null__orders__order_id").exists())
    assert(EcomSchemaTests.checks.nonEmpty) // entry point wired for the full matrix
  }

  test("declared schema.yml matrix is fully transcribed: 150 tests") {
    import graft.ecom.EcomSchemaTests
    val checks = EcomSchemaTests.checks
    // 38 source-tier + 27 staging + 50 intermediate + 35 marts
    assert(checks.size == 150)
    assert(checks.map(_.name).distinct.size == checks.size, "test ids must be unique")
    // the matrix's single declared severity: warn
    // (ecom_intermediate/schema.yml:184 order_items.product_id)
    val warns = checks.filter(_.severity == "warn")
    assert(warns.map(_.name) ==
      Seq("relationships__order_items__product_id__products_enriched__product_id"))
  }

  test("intermediate rollups: category/subcategory counts and review denorm") {
    import spark.implicits._
    val ce = out("categories_enriched")
    val e = ce.filter($"category_id" === "1").head()
    assert(e.getAs[Long]("subcategory_count") == 1 && e.getAs[Long]("product_count") == 1)
    val se = out("subcategories_enriched").filter($"subcategory_id" === "101").head()
    assert(se.getAs[Long]("product_count") == 1)
    val re = out("reviews_enriched")
    val r2 = re.filter($"review_id" === "R2").head()
    assert(r2.getAs[String]("product_name") == "Widget")
    assert(r2.getAs[String]("category_name") == "Electronics")
    assert(r2.getAs[String]("brand_name") == "Acme Corp") // TRIM'd join
    val ci = out("customer_interactions").head()
    assert(ci.getAs[String]("category_id") == "1") // product annotation
  }

  test("new marts: dim denorms, date spine, per-order fct grain") {
    import spark.implicits._
    val dp = out("dim_products").filter($"product_id" === "P1").head()
    assert(dp.getAs[String]("category_name") == "Electronics")
    assert(dp.getAs[String]("subcategory_name") == "Phones")
    assert(dp.getAs[String]("brand_name") == "Acme Corp")
    val dc = out("dim_categories").filter($"category_id" === "1").head()
    assert(dc.getAs[String]("subcategories") == "Phones") // LISTAGG port
    assert(out("dim_locations").count() == 2) // Berlin + Munich, deduped
    // spine: 3 order dates + 1 interaction date, DOW Sunday=0
    val dd = out("dim_dates")
    assert(dd.count() == 4)
    val d = dd.filter($"date_day" === java.sql.Timestamp.valueOf("2024-12-01 10:00:00")).head()
    assert(d.getAs[Int]("day_of_week") == 0) // 2024-12-01 was a Sunday
    // per-order grain with the reference's reviews fan-out kept
    val fco = out("fct_customer_orders")
    assert(fco.count() == 3)
    val o1 = fco.filter($"order_id" === "O1").head()
    assert(o1.getAs[Long]("unique_products") == 2)
    // reviews join on order_id ALONE (reference :17): O1's 2 items × its 3
    // reviews (R1,R2,R3) = 6 joined rows, sum(quantity) = (2+1)·3 = 9 —
    // the reference's fan-out, ported as written
    assert(o1.getAs[Long]("total_items") == 9)
    val fod = out("fct_order_details")
    assert(fod.filter($"order_id" === "O1").count() >= 2)
    assert(fod.filter($"shipping_address".isNotNull).count() == 0) // quirk survives
    val fpi = out("fct_product_interactions").head()
    assert(fpi.getAs[Long]("views") == 1 && fpi.getAs[Long]("unique_customers") == 1)
  }

  test("materialized run writes tables and keeps views lazy") {
    val dir = java.nio.file.Files.createTempDirectory("ecom").toString
    val res = ModelGraph.run(spark, Ecom.models(now, today), raw, dir)
    assert(res("fct_sales_by_date").count() == 3)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/orders")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/stg_orders")))
  }
}
