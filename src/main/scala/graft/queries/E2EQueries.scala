package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ingest
import graft.sources.{DataGen, Sources}

/** The reference's daily loop composed END TO END as one oracle-checked
  * key (VERDICT r7 #3): seeded generation → persisted landing artifacts
  * (envelope JSON + header CSV, the generator's output shapes) → the
  * ingest chain (envelope read, flatten, uppercase+lineage, type
  * coercion, PK keep-latest, keyed parquet upsert) → a mart aggregate
  * over the merged warehouse state.
  *
  * Reference shape: ecom_airflow/dags/gen_latest_synth_dag.py:56-71
  * (generate → ingest wiring) + src/pipeline/ingest_latest_synthetic_data
  * .py:787-844 (run_etl). Two daily batches run through the loop — the
  * second updates every overlapping PK and adds new ones, so the upsert
  * path is load-bearing, not a first-insert.
  *
  * The DuckDB replay reads the SAME landing files this key writes
  * (read_json/read_csv over /tmp/graft_e2e) and re-derives the merge as
  * batch-2-wins anti-semantics — so a writer, reader, flatten, coercion,
  * dedup, upsert, or mart bug all land in the hash compare. Generation
  * itself is spec-certified (DataGenSpec: counter-based, repartition-
  * stable); what DuckDB certifies here is every byte AFTER the generator:
  * the artifacts and the pipeline over them.
  *
  * Scale: the batch is deliberately small (the reference's daily
  * increment is too) — every operator in the chain is the already-proven
  * distributed path (envelope explode, narrow normalize, one dedup
  * shuffle, broadcast anti-join upsert, one mart agg shuffle).
  */
object E2EQueries {

  private type Q = (SparkSession, String) => DataFrame

  /** Fixed landing/warehouse root — embedded verbatim in the oracle SQL,
    * wiped and rewritten on every run so reruns are deterministic. */
  private val Root = "/tmp/graft_e2e"

  private val customersRecord = StructType(Seq(
    StructField("customer_id", LongType), StructField("email", StringType),
    StructField("first_name", StringType), StructField("last_name", StringType),
    StructField("age", IntegerType), StructField("gender", StringType),
    StructField("annual_income", LongType), StructField("marital_status", StringType),
    StructField("education", StringType), StructField("location_type", StringType),
    StructField("city", StringType), StructField("state", StringType),
    StructField("country", StringType), StructField("signup_date", TimestampType),
    StructField("last_login", TimestampType), StructField("preferred_channel", StringType),
    StructField("is_active", BooleanType)))

  private val ordersRecord = StructType(Seq(
    StructField("order_id", LongType), StructField("customer_id", LongType),
    StructField("order_date", TimestampType), StructField("status", StringType),
    StructField("shipping_cost", DoubleType), StructField("payment_method", StringType),
    StructField("shipping_address", StringType), StructField("billing_address", StringType),
    StructField("created_at", TimestampType), StructField("updated_at", TimestampType),
    StructField("total_amount", DoubleType)))

  private val itemsSchema = StructType(Seq(
    StructField("order_item_id", LongType), StructField("order_id", LongType),
    StructField("product_id", LongType), StructField("quantity", LongType),
    StructField("unit_price", DoubleType), StructField("total_price", DoubleType),
    StructField("created_at", TimestampType)))

  /** One daily iteration: land the generated batch, then ingest the three
    * mart-feeding tables into the parquet warehouse. Only the consumed
    * tables are landed (customers/orders as envelope JSON, order_items as
    * CSV — one per writer shape): landing all 8 would triple the key's
    * wall for surface already certified by DataGenSpec/WritersCatalogSpec,
    * and the bench runs this key three times per pass. */
  private def runDay(s: SparkSession, batch: Map[String, DataFrame],
      batchId: String, day: String): Unit = {
    DataGen.writeAll(
      batch.view.filterKeys(Set("customers", "orders", "order_items")).toMap,
      s"$Root/$batchId", s"${day}T00:00:00")
    val loadedAt = java.sql.Timestamp.valueOf(s"$day 06:00:00")
    def normalize(df: DataFrame, types: Map[String, DataType]) =
      Ingest.normalize(Sources.flatten(df), "json_envelope", batchId, loadedAt, types)
    // the three table ingests are independent — run them as concurrent
    // Spark jobs, the same fan-out the reference DAG schedules as
    // parallel Airflow tasks (ingest wall is job-overhead-bound, not
    // compute-bound, so overlap is the whole win)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(Ingest.ingest(s"$Root/wh/customers",
        Seq(normalize(
          Sources.readJsonEnvelope(s, s"$Root/$batchId/json/customers.json", customersRecord),
          Map.empty)),
        Seq("CUSTOMER_ID"), Seq(col("LOADED_AT")))),
      Future(Ingest.ingest(s"$Root/wh/orders",
        Seq(normalize(
          Sources.readJsonEnvelope(s, s"$Root/$batchId/json/orders.json", ordersRecord),
          Map("TOTAL_AMOUNT" -> DecimalType(18, 2)))),
        Seq("ORDER_ID"), Seq(col("UPDATED_AT"), col("LOADED_AT")))),
      Future(Ingest.ingest(s"$Root/wh/order_items",
        Seq(normalize(
          Sources.readCsv(s, s"$Root/$batchId/csv/order_items", itemsSchema),
          Map.empty)),
        Seq("ORDER_ITEM_ID"), Seq(col("CREATED_AT"), col("LOADED_AT")))))),
      Duration.Inf)
  }

  private val e2eGenerateIngest: Q = (s, dir) => {
    import s.implicits._
    // deterministic rerun: wipe landing + warehouse before day 1
    val fs = new org.apache.hadoop.fs.Path(Root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(Root), true)
    // day 1 (historic): 30 customers; day 2 (latest increment): 35 — the
    // 30 overlapping PKs arrive with different attribute draws (different
    // seed), so day 2 must WIN them and add 5 new, across all three tables
    runDay(s, DataGen.generateAll(s, nCustomers = 30, nProducts = 20, seed = 9001),
      "b1", "2026-01-01")
    runDay(s, DataGen.generateAll(s, nCustomers = 35, nProducts = 20, seed = 9002),
      "b2", "2026-01-02")
    val customers = s.read.parquet(s"$Root/wh/customers")
    val orders = s.read.parquet(s"$Root/wh/orders")
    val items = s.read.parquet(s"$Root/wh/order_items")
    val unitsPerOrder = items.groupBy($"ORDER_ID")
      .agg(sum($"QUANTITY").as("n_units"))
    orders
      .join(customers.select($"CUSTOMER_ID", $"LOCATION_TYPE"), Seq("CUSTOMER_ID"))
      .join(unitsPerOrder, Seq("ORDER_ID"), "left")
      .groupBy($"LOCATION_TYPE".as("location_type"), $"STATUS".as("status"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"CUSTOMER_ID").as("n_customers"),
        sum(coalesce($"n_units", lit(0L))).as("n_units"),
        // exact decimal sum, then ONE cast to double — repr-stable on
        // both engines (a double sum would vary with reduce order)
        sum($"TOTAL_AMOUNT").cast("double").as("revenue"))
      .orderBy($"location_type", $"status")
  }

  def queries: Map[String, Q] = Map(
    "e2e_generate_ingest" -> e2eGenerateIngest
  )

  // ------------------------------------------------------------- oracle --
  // DuckDB replays the pipeline from the LANDED ARTIFACTS (the same files
  // the key wrote): envelope JSON unnest = readJsonEnvelope+flatten, CSV
  // glob = readCsv, batch-2-wins NOT IN = dedup+upsert (PKs are unique
  // within a batch, so keep-latest reduces to batch priority), and the
  // same mart aggregate. Uppercasing/lineage columns don't surface in the
  // mart, so the replay stays on the data columns.

  private def env(b: String, t: String): String =
    s"(SELECT unnest(data, recursive := true) FROM read_json('$Root/$b/json/$t.json'))"

  def oracle: Map[String, String] = Map(
    "e2e_generate_ingest" ->
      s"""WITH c1 AS (SELECT * FROM ${env("b1", "customers")}),
         |c2 AS (SELECT * FROM ${env("b2", "customers")}),
         |cm AS (SELECT * FROM c2 UNION ALL
         |       SELECT * FROM c1 WHERE customer_id NOT IN (SELECT customer_id FROM c2)),
         |o1 AS (SELECT * FROM ${env("b1", "orders")}),
         |o2 AS (SELECT * FROM ${env("b2", "orders")}),
         |om AS (SELECT * FROM o2 UNION ALL
         |       SELECT * FROM o1 WHERE order_id NOT IN (SELECT order_id FROM o2)),
         |i1 AS (SELECT * FROM read_csv('$Root/b1/csv/order_items/*.csv', header=true)),
         |i2 AS (SELECT * FROM read_csv('$Root/b2/csv/order_items/*.csv', header=true)),
         |im AS (SELECT * FROM i2 UNION ALL
         |       SELECT * FROM i1 WHERE order_item_id NOT IN (SELECT order_item_id FROM i2)),
         |iagg AS (SELECT order_id, SUM(quantity) AS n_units FROM im GROUP BY 1),
         |j AS (SELECT c.location_type, o.status, o.customer_id,
         |        CAST(o.total_amount AS DECIMAL(18,2)) AS amt,
         |        COALESCE(i.n_units, 0) AS n_units
         |      FROM om o JOIN cm c ON o.customer_id = c.customer_id
         |      LEFT JOIN iagg i ON o.order_id = i.order_id)
         |SELECT location_type, status,
         | COUNT(*) AS n_orders,
         | COUNT(DISTINCT customer_id) AS n_customers,
         | CAST(SUM(n_units) AS BIGINT) AS n_units,
         | CAST(SUM(amt) AS DOUBLE) AS revenue
         |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
