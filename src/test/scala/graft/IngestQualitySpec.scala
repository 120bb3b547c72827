package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Ingest, Quality}

class IngestQualitySpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-01-02 00:00:00")

  test("normalize: uppercase + lineage + coercion with *_ID string rule") {
    import spark.implicits._
    val raw = Seq(("1", "42", "2.5")).toDF("customer_id", "age", "score")
    val out = Ingest.normalize(raw, "historic", "batch-1", t0,
      Map("AGE" -> IntegerType, "SCORE" -> DoubleType))
    assert(out.columns.toSeq == Seq("CUSTOMER_ID", "AGE", "SCORE",
      "DATA_SOURCE", "BATCH_ID", "LOADED_AT"))
    val r = out.head()
    assert(r.getAs[String]("CUSTOMER_ID") == "1") // *_ID stays string
    assert(r.getAs[Int]("AGE") == 42)
    assert(r.getAs[String]("DATA_SOURCE") == "historic")
    assert(r.getAs[Timestamp]("LOADED_AT") == t0)
  }

  test("ingest end-to-end: combine parts, keep-latest, upsert to parquet") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ingest").toString
    val target = s"$dir/customers.parquet"
    val historic = Ingest.normalize(
      Seq(("C1", "Ann"), ("C2", "Bo")).toDF("customer_id", "name"),
      "historic", "b0", t0, Map.empty)
    Ingest.ingest(target, Seq(historic), Seq("CUSTOMER_ID"), Seq(col("LOADED_AT")))
    // latest batch: update C2, add C3, and include a new column
    val latest = Ingest.normalize(
      Seq(("C2", "Bob", "bob@x.io"), ("C3", "Cy", "cy@x.io"))
        .toDF("customer_id", "name", "email"),
      "latest", "b1", t1, Map.empty)
    Ingest.ingest(target, Seq(spark.read.parquet(target), latest),
      Seq("CUSTOMER_ID"), Seq(col("LOADED_AT")))
    val out = spark.read.parquet(target)
      .select("CUSTOMER_ID", "name", "DATA_SOURCE")
      .orderBy("CUSTOMER_ID").as[(String, String, String)].collect().toSeq
    assert(out == Seq(("C1", "Ann", "historic"),
      ("C2", "Bob", "latest"), ("C3", "Cy", "latest")))
  }

  test("quality checks return failing rows; empty means pass") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, null.asInstanceOf[String])).toDF("id", "v")
    assert(Quality.unique(df, Seq("id")).count() == 1) // id=1 duplicated
    assert(Quality.unique(df, Seq("id", "v")).count() == 0)
    assert(Quality.notNull(df, "v").count() == 1)
    val parent = Seq(1).toDF("id")
    assert(Quality.relationship(df, "id", parent, "id").count() == 1) // id=2 orphan
    assert(Quality.acceptedValues(df, "v", Seq("a", "b")).count() == 0) // null not a violation
    val res = Quality.run(Seq("uniq_id" -> Quality.unique(df, Seq("id"))))
    assert(res == Seq(Quality.CheckResult("uniq_id", 1)))
  }
}
