package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{DataGen, Sources, Writers}

class DataGenSpec extends SparkSpec {

  test("generation is deterministic and partitioning-independent") {
    def gen(parts: Int) = DataGen.ids(spark, 1000, parts)
      .withColumn("income", DataGen.normal(col("id"), 65000, 30000, seed = 42))
      .withColumn("n_orders", DataGen.poisson(col("id"), 5.0, seed = 43))
      .withColumn("status", DataGen.categorical(col("id"),
        Seq("Pending", "Shipped", "Delivered"), Seq(0.2, 0.3, 0.5), seed = 44))
      .withColumn("order_date",
        DataGen.timestampIn(col("id"), "2023-01-01 00:00:00", "2025-01-15 00:00:00", 45))
      .orderBy("id")
    val a = gen(4).collect().map(_.toSeq)
    val b = gen(13).collect().map(_.toSeq) // different layout, same data
    assert(a.toSeq == b.toSeq)
  }

  test("distributions are plausible: normal/poisson means, categorical weights") {
    val df = DataGen.ids(spark, 20000, 8)
      .withColumn("x", DataGen.normal(col("id"), 65000, 30000, seed = 6))
      .withColumn("k", DataGen.poisson(col("id"), 5.0, seed = 7))
      .withColumn("c", DataGen.categorical(col("id"), Seq("a", "b"), Seq(0.8, 0.2), seed = 8))
    val r = df.agg(avg("x"), avg("k")).head()
    assert(math.abs(r.getDouble(0) - 65000) < 1000, s"normal mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 5.0) < 0.2, s"poisson mean ${r.getDouble(1)}")
    val aShare = df.filter(col("c") === "a").count().toDouble / 20000
    assert(aShare > 0.77 && aShare < 0.83, s"categorical share $aShare")
  }

  test("entity graph: volumes track the reference's Poisson parameters") {
    val data = DataGen.generateAll(spark, nCustomers = 2000, nProducts = 500, seed = 7)
    val nCust = 2000.0
    val nOrders = data("orders").count()
    val nItems = data("order_items").count()
    // E[orders/customer] = 5·E[clamp(income/65k, .5, 2)] ≈ 5·1.02 with the
    // N(65k,30k) floor-at-15k income draw — loose band around it
    val perCust = nOrders / nCust
    assert(perCust > 4.3 && perCust < 6.3, s"orders/customer $perCust")
    // items/order ~ Poisson(2)+1 → mean 3
    val perOrder = nItems.toDouble / nOrders
    assert(perOrder > 2.8 && perOrder < 3.2, s"items/order $perOrder")
    // interactions ~ Poisson(20)/customer
    val perCustEvents = data("interactions").count() / nCust
    assert(perCustEvents > 19.0 && perCustEvents < 21.0, s"events/customer $perCustEvents")
    // one review per order item, by construction (:300-352)
    assert(data("reviews").count() == nItems)
  }

  test("entity graph: demographic correlation and referential closure") {
    val data = DataGen.generateAll(spark, nCustomers = 2000, nProducts = 300, seed = 11)
    val custOrders = data("customers").select("customer_id", "annual_income")
      .join(data("orders").groupBy("customer_id").agg(count(lit(1)).as("n")),
        Seq("customer_id"), "left")
      .na.fill(0, Seq("n"))
    // income factor clamps at 0.5/2.0 ⇒ rich customers order ~4× more
    val rich = custOrders.filter(col("annual_income") > 100000).agg(avg("n")).head().getDouble(0)
    val poor = custOrders.filter(col("annual_income") < 40000).agg(avg("n")).head().getDouble(0)
    assert(rich > poor * 2, s"income correlation lost: rich=$rich poor=$poor")

    // order totals accumulate their items exactly (:211-224)
    val mismatch = data("orders").join(
      data("order_items").groupBy("order_id")
        .agg(sum("total_price").as("items_total")), Seq("order_id"))
      .filter(abs(col("total_amount") - col("shipping_cost") - col("items_total")) > 0.011)
      .count()
    assert(mismatch == 0, s"$mismatch orders whose total != shipping + items")

    // review_count = initial + per-product tally (:345-346)
    val base = DataGen.products(spark, 300, seed = 11) // same seed as generateAll's prods
    val tally = data("reviews").groupBy("product_id").agg(count(lit(1)).as("t"))
    val bad = data("products").select(col("product_id"), col("review_count"))
      .join(base.select(col("product_id"), col("review_count").as("rc0")), Seq("product_id"))
      .join(tally, Seq("product_id"), "left").na.fill(0, Seq("t"))
      .filter(col("review_count") =!= col("rc0") + col("t")).count()
    assert(bad == 0, s"$bad products with inconsistent review_count")

    // FKs close: every order_item/order/interaction points at a parent
    assert(data("order_items").join(data("orders"), Seq("order_id"), "left_anti").count() == 0)
    assert(data("orders").join(data("customers"), Seq("customer_id"), "left_anti").count() == 0)
    assert(data("products").join(data("subcategories"), Seq("subcategory_id"), "left_anti").count() == 0)
    // subcategory consistent with category (taxonomy rule, :120-122)
    assert(data("products").join(data("subcategories")
        .withColumnRenamed("category_id", "sc_cat"), Seq("subcategory_id"))
      .filter(col("category_id") =!= col("sc_cat")).count() == 0)
  }

  test("entity graph is deterministic under repartition") {
    def run(parts: Int) = {
      val custs = DataGen.customers(spark, 300, seed = 5).repartition(parts)
      val shells = DataGen.orderShells(custs, seed = 6)
      val items = DataGen.orderItems(shells, DataGen.products(spark, 100, 4), 100, seed = 7)
      items.orderBy("order_item_id").collect().map(_.toSeq).toSeq
    }
    assert(run(3) == run(17), "child generation changed under a different layout")
  }

  test("entity graph round-trips through the landing-zone shapes into ingest") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("genall").toString
    val data = DataGen.generateAll(spark, nCustomers = 200, nProducts = 50, seed = 3)
    DataGen.writeAll(data, dir, "1998-06-01T00:00:00")

    // envelope JSON tables read back through the S1 reader
    val orderRecord = StructType(Seq(
      StructField("order_id", LongType), StructField("customer_id", LongType),
      StructField("status", StringType), StructField("total_amount", DoubleType)))
    val ordersBack = Sources.readJsonEnvelope(spark, s"$dir/json/orders.json", orderRecord)
    assert(ordersBack.count() == data("orders").count())
    // CSV tables read back through the S2 reader
    val itemRecord = StructType(Seq(
      StructField("order_item_id", LongType), StructField("order_id", LongType),
      StructField("product_id", LongType), StructField("quantity", LongType),
      StructField("unit_price", DoubleType), StructField("total_price", DoubleType),
      StructField("created_at", TimestampType)))
    val itemsBack = Sources.readCsv(spark, s"$dir/csv/order_items", itemRecord)
    assert(itemsBack.count() == data("order_items").count())

    // and into the ingest path: normalize (uppercase + lineage + coercion)
    // then keyed upsert into a parquet target — the medallion's raw layer
    val normalized = graft.operators.Ingest.normalize(itemsBack, "s3_csv", "b1",
      java.sql.Timestamp.valueOf("1998-06-01 00:00:00"), Map.empty)
    val target = s"$dir/raw_order_items"
    graft.operators.Ingest.ingest(target, Seq(normalized), Seq("ORDER_ITEM_ID"),
      Seq(col("LOADED_AT").desc))
    assert(spark.read.parquet(target).count() == data("order_items").count())
  }

  test("generate -> envelope write -> envelope read -> ingest round trip") {
    val dir = java.nio.file.Files.createTempDirectory("gen").toString
    val customers = DataGen.ids(spark, 50, 2)
      .select(concat(lit("C"), col("id")).as("customer_id"),
        DataGen.normal(col("id"), 45, 15, 9).cast("int").as("age"))
    Writers.writeJsonEnvelope(customers, "customers",
      s"$dir/customers.json", "2025-01-15T00:00:00")
    val record = StructType(Seq(
      StructField("customer_id", StringType), StructField("age", IntegerType)))
    val back = Sources.readJsonEnvelope(spark, s"$dir/customers.json", record)
    assert(back.count() == 50)
    assert(back.columns.toSeq == Seq("customer_id", "age"))
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/customers.json"))
    assert(meta.contains(""""recordCount": 50"""))
  }
}
