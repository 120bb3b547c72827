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
