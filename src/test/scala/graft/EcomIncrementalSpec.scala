package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import graft.ecom.Ecom
import graft.plans.ModelGraph

/** VERDICT r3 item 3: prove incremental-refresh ≡ full-rebuild for the
  * reference's functional incremental mart, fct_customer_orders
  * (customer/fct_customer_orders.sql:18-20), THROUGH ModelGraph.run —
  * bootstrap on the old order set, refresh after new orders arrive, and the
  * merged store must match a one-shot build over everything.
  *
  * Sound because the mart's grain is per-order and every aggregate is
  * order-local (items/reviews join on order_id), so rows above the
  * order_date watermark are complete on their own — the same property the
  * reference's is_incremental() WHERE clause relies on.
  */
class EcomIncrementalSpec extends SparkSpec {

  private val now = Timestamp.valueOf("2025-01-15 00:00:00")
  private val today = Date.valueOf("2025-01-15")

  private def rawOrders(rows: Seq[(String, String, String, String, String, String,
      String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ORDER_ID", "CUSTOMER_ID", "ORDER_DATE", "STATUS", "TOTAL_AMOUNT",
      "SHIPPING_COST", "PAYMENT_METHOD", "SHIPPING_ADDRESS", "BILLING_ADDRESS",
      "LOADED_AT")
  }

  private val oldOrders = Seq(
    ("O1", "C1", "2024-12-20 10:00:00", "Delivered", "120.00", "10.00",
      "Credit Card", "15 Dunn Key", "15 Dunn Key", "2024-12-20 10:00:00"),
    ("O2", "C1", "2024-05-05 09:00:00", "Shipped", "80.00", "5.00",
      "PayPal", "7 Oak Street", "7 Oak Street", "2024-05-05 09:00:00"))
  private val newOrders = Seq(
    ("O3", "C2", "2025-01-02 14:00:00", "Pending", "200.00", "20.00",
      "Debit Card", "99 Pine Road", "99 Pine Road", "2025-01-02 14:00:00"),
    ("O4", "C1", "2025-01-10 08:00:00", "Pending", "50.00", "5.00",
      "PayPal", "7 Oak Street", "7 Oak Street", "2025-01-10 08:00:00"))

  private val oldReviews = Seq(
    ("R1", "P1", "O1", "C1", "5", "great", "2024-12-25 00:00:00"))
  private val newReviews = Seq(
    ("R2", "P2", "O3", "C2", "3", "ok", "2025-01-03 00:00:00"))

  private val oldInteractions = Seq(
    ("E1", "C1", "P1", "view", "2024-12-01 10:00:00", "mobile", "s1", "2024-12-01 10:00:00"))
  // one event in a NEW month and one landing in the BOUNDARY month
  // (2024-12) — the case month-replace merge must re-derive and
  // high-watermark append would get wrong
  private val newInteractions = Seq(
    ("E2", "C1", "P1", "view", "2025-01-05 09:00:00", "desktop", "s2", "2025-01-05 09:00:00"),
    ("E3", "C1", "P2", "purchase", "2024-12-15 18:00:00", "mobile", "s3", "2024-12-15 18:00:00"))

  /** Raw sources; items cover BOTH eras in every run — staging is
    * always fully recomputed, only the mart stores are incremental. */
  private def raw(orders: Seq[(String, String, String, String, String, String,
      String, String, String, String)],
      reviews: Seq[(String, String, String, String, String, String, String)] =
        oldReviews ++ newReviews,
      interactions: Seq[(String, String, String, String, String, String,
        String, String)] = oldInteractions): Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "raw_customers" -> Seq(
        ("C1", "ann@x.io", "Ann", "Lee", "34", "F", "82000.50", "Married", "Master",
          "Urban", "Berlin", "BE", "Germany", "2023-02-01 10:00:00",
          "2025-01-10 09:00:00", "Web", "true", "2024-06-01 00:00:00"),
        ("C2", "bo@x.io", "Bo", "Kim", "51", "M", "54000.00", "Single", "Bachelor",
          "Rural", "Munich", "BY", "Germany", "2022-07-15 08:00:00",
          "2024-12-01 12:00:00", "Mobile App", "true", "2024-06-01 00:00:00"))
        .toDF("CUSTOMER_ID", "EMAIL", "FIRST_NAME", "LAST_NAME", "AGE", "GENDER",
          "ANNUAL_INCOME", "MARITAL_STATUS", "EDUCATION", "LOCATION_TYPE", "CITY",
          "STATE", "COUNTRY", "SIGNUP_DATE", "LAST_LOGIN", "PREFERRED_CHANNEL",
          "IS_ACTIVE", "LOADED_AT"),
      "raw_orders" -> rawOrders(orders),
      "raw_order_items" -> Seq(
        ("I1", "O1", "P1", "2", "30.00", "60.00", "2024-12-20 10:00:00"),
        ("I2", "O1", "P2", "1", "60.00", "60.00", "2024-12-20 10:00:00"),
        ("I3", "O2", "P1", "1", "80.00", "80.00", "2024-05-05 09:00:00"),
        ("I4", "O3", "P2", "1", "200.00", "200.00", "2025-01-02 14:00:00"),
        ("I5", "O4", "P1", "1", "50.00", "50.00", "2025-01-10 08:00:00"))
        .toDF("ORDER_ITEM_ID", "ORDER_ID", "PRODUCT_ID", "QUANTITY", "UNIT_PRICE",
          "TOTAL_PRICE", "CREATED_AT"),
      "raw_products" -> Seq(
        ("P1", "1", "101", "Widget", "a widget", "35.00", "30.00", "10", "0.40",
          "Acme Corp", "4.5", "true", "2023-01-01 00:00:00"),
        ("P2", "2", "201", "Gadget", "a gadget", "70.00", "60.00", "5", "1.20",
          "Acme Corp", "3.9", "true", "2023-02-01 00:00:00"))
        .toDF("PRODUCT_ID", "CATEGORY_ID", "SUBCATEGORY_ID", "PRODUCT_NAME",
          "DESCRIPTION", "BASE_PRICE", "SALE_PRICE", "STOCK_QUANTITY", "WEIGHT_KG",
          "BRAND", "RATING", "IS_ACTIVE", "CREATED_AT"),
      "raw_reviews" -> reviews
        .toDF("REVIEW_ID", "PRODUCT_ID", "ORDER_ID", "CUSTOMER_ID", "REVIEW_SCORE",
          "REVIEW_TEXT", "LOADED_AT"),
      "raw_categories" -> Seq(
        ("1", "Electronics", "2022-01-01 00:00:00"), ("2", "Fashion", "2022-01-02 00:00:00"))
        .toDF("CATEGORY_ID", "CATEGORY_NAME", "CREATED_AT"),
      "raw_subcategories" -> Seq(
        ("101", "1", "Phones", "2022-02-01 00:00:00"), ("201", "2", "Shoes", "2022-02-02 00:00:00"))
        .toDF("SUBCATEGORY_ID", "CATEGORY_ID", "SUBCATEGORY_NAME", "CREATED_AT"),
      "raw_interactions" -> interactions
        .toDF("EVENT_ID", "CUSTOMER_ID", "PRODUCT_ID", "EVENT_TYPE", "EVENT_DATE",
          "DEVICE_TYPE", "SESSION_ID", "CREATED_AT"))
  }

  private def rows(df: DataFrame): Set[String] = {
    import org.apache.spark.sql.functions.col
    df.select(df.columns.sorted.map(col).toSeq: _*)
      .collect().map(_.mkString("|")).toSet
  }

  test("fct_customer_orders: bootstrap + delta refresh == one-shot rebuild") {
    val store = java.nio.file.Files.createTempDirectory("ecom_inc").toString
    val oneShot = java.nio.file.Files.createTempDirectory("ecom_full").toString
    val models = Ecom.models(now, today)

    // run 1: bootstrap over the pre-cutoff orders
    val boot = ModelGraph.run(spark, models, raw(oldOrders), store)("fct_customer_orders")
    assert(boot.count() == 2)

    // run 2: same store, full sources — only O3/O4 rows should append
    val merged = ModelGraph.run(spark, models, raw(oldOrders ++ newOrders), store)("fct_customer_orders")
    val full = ModelGraph.run(spark, models, raw(oldOrders ++ newOrders), oneShot)("fct_customer_orders")
    assert(merged.count() == 4)
    assert(rows(merged) == rows(full))
  }

  test("streaming order feed refreshes the incremental mart to batch parity") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("ecom_stream").toString
    val in = s"$dir/in"
    val target = s"$dir/mart"
    val fullRaw = raw(oldOrders ++ newOrders)
    // stable sides (items, reviews, the one-shot mart to compare against)
    val statics = ModelGraph.run(spark, Ecom.models(now, today), fullRaw,
      java.nio.file.Files.createTempDirectory("ecom_static").toString)

    // each micro-batch runs the SAME model code over just the new raw
    // orders and merges on the mart's key — valid because every mart
    // aggregate is order-local and the lookup surrogate ids are
    // value-derived md5s, identical no matter which batch built them
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(rawOrders(oldOrders).schema).parquet(in)
      stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val stg = Ecom.stgOrders(batch)
            val oInt = Ecom.ordersInt(stg,
              Ecom.orderStatuses(stg, now), Ecom.paymentMethods(stg, now),
              statics("addresses"),
              Ecom.stgOrderItems(fullRaw("raw_order_items")),
              Ecom.stgReviews(fullRaw("raw_reviews")))
            val mart = Ecom.fctCustomerOrders(oInt,
              statics("order_items"), statics("reviews_enriched"))
            graft.operators.Upsert.intoParquet(target, mart, Seq("order_id"))
          }
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }

    rawOrders(oldOrders).write.mode("append").parquet(in)
    drain()
    assert(spark.read.parquet(target).count() == 2)
    rawOrders(newOrders).write.mode("append").parquet(in)
    drain() // checkpoint ensures only the new wave is reprocessed
    assert(rows(spark.read.parquet(target)) == rows(statics("fct_customer_orders")),
      "streamed mart state must equal the one-shot batch build")
  }

  test("fct_customer_reviews: created_at watermark refresh == one-shot rebuild") {
    val store = java.nio.file.Files.createTempDirectory("ecom_rev_inc").toString
    val oneShot = java.nio.file.Files.createTempDirectory("ecom_rev_full").toString
    val models = Ecom.models(now, today)
    val allOrders = oldOrders ++ newOrders

    val boot = ModelGraph.run(spark, models,
      raw(allOrders, reviews = oldReviews), store)("fct_customer_reviews")
    assert(boot.count() == 1)

    val merged = ModelGraph.run(spark, models, raw(allOrders), store)("fct_customer_reviews")
    val full = ModelGraph.run(spark, models, raw(allOrders), oneShot)("fct_customer_reviews")
    assert(merged.count() == 2) // R2 appended past the created_at watermark
    assert(rows(merged) == rows(full))
  }

  test("fct_customer_activity: boundary-month merge refresh == one-shot rebuild") {
    import org.apache.spark.sql.functions.col
    val store = java.nio.file.Files.createTempDirectory("ecom_act_inc").toString
    val oneShot = java.nio.file.Files.createTempDirectory("ecom_act_full").toString
    val models = Ecom.models(now, today)

    val boot = ModelGraph.run(spark, models,
      raw(oldOrders, interactions = oldInteractions), store)("fct_customer_activity")
    assert(boot.count() == 1) // C1 × 2024-12, views only

    // refresh: one event in a NEW month, one MORE event in the boundary
    // month — the December aggregate must be re-derived, not left stale
    // (or duplicated, as a plain high-watermark append would)
    val src = raw(oldOrders, interactions = oldInteractions ++ newInteractions)
    val merged = ModelGraph.run(spark, models, src, store)("fct_customer_activity")
    val full = ModelGraph.run(spark, models, src, oneShot)("fct_customer_activity")
    assert(merged.count() == 2) // C1 × {2024-12, 2025-01}
    assert(rows(merged) == rows(full))
    val dec = merged.filter(col("activity_month") === java.sql.Date.valueOf("2024-12-01"))
      .select("total_views", "purchases").head()
    assert(dec.getLong(0) == 1 && dec.getLong(1) == 1,
      "boundary month must include the late purchase after the merge")
  }

  test("streaming interaction feed refreshes the aggregate mart to batch parity") {
    import org.apache.spark.sql.functions.{broadcast, col, trunc}
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("ecom_act_stream").toString
    val in = s"$dir/in"
    val rawStore = s"$dir/raw_interactions"
    val target = s"$dir/mart"
    val fullRaw = raw(oldOrders, interactions = oldInteractions ++ newInteractions)
    val statics = ModelGraph.run(spark, Ecom.models(now, today), fullRaw,
      java.nio.file.Files.createTempDirectory("ecom_act_static").toString)

    def interDf(rows: Seq[(String, String, String, String, String, String,
        String, String)]): DataFrame = {
      import spark.implicits._
      rows.toDF("EVENT_ID", "CUSTOMER_ID", "PRODUCT_ID", "EVENT_TYPE", "EVENT_DATE",
        "DEVICE_TYPE", "SESSION_ID", "CREATED_AT")
    }

    // The streaming analog of IncrementalMerge: each micro-batch lands in
    // the raw store, the AFFECTED months (only) re-aggregate from the
    // cumulative store, and the mart upserts on its (customer, month)
    // grain — an aggregate can't append, the boundary month re-derives.
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(interDf(oldInteractions).schema).parquet(in)
      stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            batch.write.mode("append").parquet(rawStore)
            val stgAll = Ecom.stgInteractions(spark.read.parquet(rawStore))
            val interAll = Ecom.customerInteractions(stgAll,
              Ecom.stgProducts(fullRaw("raw_products")))
            val affected = Ecom.stgInteractions(batch)
              .select(trunc(col("event_date").cast("date"), "month").as("activity_month"))
              .distinct()
            val delta = Ecom.fctCustomerActivity(
                statics("customers_enriched"), interAll, now)
              .join(broadcast(affected), Seq("activity_month"))
            graft.operators.Upsert.intoParquet(target, delta,
              Seq("customer_id", "activity_month"))
          }
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }

    interDf(oldInteractions).write.mode("append").parquet(in)
    drain()
    assert(spark.read.parquet(target).count() == 1) // C1 × 2024-12
    interDf(newInteractions).write.mode("append").parquet(in)
    drain() // E3 lands in the already-published December month
    assert(rows(spark.read.parquet(target)) == rows(statics("fct_customer_activity")),
      "streamed aggregate mart must equal the one-shot batch build")
  }

  test("refresh with no new orders appends nothing (idempotent)") {
    val store = java.nio.file.Files.createTempDirectory("ecom_idem").toString
    val models = Ecom.models(now, today)
    val first = ModelGraph.run(spark, models, raw(oldOrders), store)("fct_customer_orders")
    val again = ModelGraph.run(spark, models, raw(oldOrders), store)("fct_customer_orders")
    assert(rows(first) == rows(again))
    assert(again.count() == 2)
  }
}
