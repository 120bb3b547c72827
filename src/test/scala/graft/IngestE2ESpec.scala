package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{DedupLatest, Ingest, Upsert}
import graft.sources.Sources

/** VERDICT r3 item 9: the reference's ETL entry point 2 — envelope JSON →
  * flatten → uppercase+lineage+coerce → PK keep-latest → keyed upsert —
  * exercised END TO END through the same operator chain
  * (ingest_latest_synthetic_data.py:787-844 run_etl), not as isolated unit
  * specs. Asserts flatten/lineage/coercion parity and that a second daily
  * increment upserts rather than appends.
  */
class IngestE2ESpec extends SparkSpec {

  private val record = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("email", StringType),
    StructField("address", StructType(Seq(
      StructField("city", StringType), StructField("zip", StringType)))),
    StructField("tags", ArrayType(StringType)),
    StructField("updated_at", StringType)))

  private def writeEnvelope(dir: String, name: String, records: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    Files.writeString(p,
      s"""{"metadata": {"table": "customers", "recordCount": 2,
         |  "generatedAt": "2025-01-01T00:00:00", "version": "1"},
         | "data": [$records]}""".stripMargin)
    p.toString
  }

  private val types: Map[String, DataType] = Map("UPDATED_AT" -> TimestampType)

  private def normalize(path: String, batch: String, at: Timestamp) =
    Ingest.normalize(
      Sources.flatten(Sources.readJsonEnvelope(spark, path, record)),
      "json_envelope", batch, at, types)

  test("envelope -> flatten -> normalize -> dedup -> upsert, twice") {
    val dir = Files.createTempDirectory("ingest_e2e").toString
    val target = s"$dir/warehouse/customers"

    // batch 1: two customers; C1 appears twice (intra-batch dup, later wins)
    val b1 = writeEnvelope(dir, "b1.json",
      """{"customer_id": 1, "email": "old@x.io",
        |  "address": {"city": "Berlin", "zip": "10115"}, "tags": ["a"],
        |  "updated_at": "2025-01-01 08:00:00"},
        | {"customer_id": 1, "email": "ann@x.io",
        |  "address": {"city": "Berlin", "zip": "10115"}, "tags": ["a","b"],
        |  "updated_at": "2025-01-01 09:00:00"},
        | {"customer_id": 2, "email": "bo@x.io",
        |  "address": {"city": "Munich", "zip": "80331"}, "tags": [],
        |  "updated_at": "2025-01-01 09:00:00"}""".stripMargin)
    val t1 = Timestamp.valueOf("2025-01-01 10:00:00")
    Ingest.ingest(target, Seq(normalize(b1, "batch_1", t1)),
      Seq("CUSTOMER_ID"), Seq(col("UPDATED_AT"), col("LOADED_AT")))

    val after1 = spark.read.parquet(target)
    // json_normalize(sep='_') parity: nested struct -> scalar columns,
    // array -> JSON string, names uppercased, lineage injected
    assert(after1.columns.sorted.toSeq == Seq("ADDRESS_CITY", "ADDRESS_ZIP",
      "BATCH_ID", "CUSTOMER_ID", "DATA_SOURCE", "EMAIL", "LOADED_AT", "TAGS",
      "UPDATED_AT"))
    assert(after1.schema("CUSTOMER_ID").dataType == StringType) // *_ID rule
    assert(after1.schema("UPDATED_AT").dataType == TimestampType)
    assert(after1.count() == 2) // intra-batch dup collapsed
    val c1 = after1.filter(col("CUSTOMER_ID") === "1").head()
    assert(c1.getAs[String]("EMAIL") == "ann@x.io") // latest wins
    assert(c1.getAs[String]("TAGS") == """["a","b"]""")
    assert(c1.getAs[String]("BATCH_ID") == "batch_1")
    assert(c1.getAs[Timestamp]("LOADED_AT") == t1)

    // batch 2 (daily increment): C2 updated, C3 new
    val b2 = writeEnvelope(dir, "b2.json",
      """{"customer_id": 2, "email": "bo+new@x.io",
        |  "address": {"city": "Hamburg", "zip": "20095"}, "tags": ["c"],
        |  "updated_at": "2025-01-02 07:00:00"},
        | {"customer_id": 3, "email": "cy@x.io",
        |  "address": {"city": "Köln", "zip": "50667"}, "tags": [],
        |  "updated_at": "2025-01-02 07:30:00"}""".stripMargin)
    val t2 = Timestamp.valueOf("2025-01-02 10:00:00")
    Ingest.ingest(target, Seq(normalize(b2, "batch_2", t2)),
      Seq("CUSTOMER_ID"), Seq(col("UPDATED_AT"), col("LOADED_AT")))

    val after2 = spark.read.parquet(target)
    assert(after2.count() == 3, "upsert, not append")
    assert(after2.select("CUSTOMER_ID").distinct().count() == 3, "PK unique")
    val c2 = after2.filter(col("CUSTOMER_ID") === "2").head()
    assert(c2.getAs[String]("EMAIL") == "bo+new@x.io")
    assert(c2.getAs[String]("ADDRESS_CITY") == "Hamburg")
    assert(c2.getAs[String]("BATCH_ID") == "batch_2")
    // untouched row keeps its original lineage
    val c1b = after2.filter(col("CUSTOMER_ID") === "1").head()
    assert(c1b.getAs[String]("BATCH_ID") == "batch_1")
    assert(c1b.getAs[Timestamp]("LOADED_AT") == t1)
  }

  test("historic + latest parts combine with schema drift before dedup") {
    val dir = Files.createTempDirectory("ingest_parts").toString
    val target = s"$dir/warehouse/customers"
    val b = writeEnvelope(dir, "b.json",
      """{"customer_id": 7, "email": "g@x.io",
        |  "address": {"city": "Bonn", "zip": "53111"}, "tags": [],
        |  "updated_at": "2025-01-01 08:00:00"}""".stripMargin)
    val t = Timestamp.valueOf("2025-01-02 10:00:00")
    val latest = normalize(b, "latest", t)
    // historic part lacks the tags column entirely (schema evolution)
    val historic = latest.drop("TAGS")
      .withColumn("CUSTOMER_ID", lit("8"))
      .withColumn("BATCH_ID", lit("historic"))
    Ingest.ingest(target, Seq(historic, latest),
      Seq("CUSTOMER_ID"), Seq(col("UPDATED_AT"), col("LOADED_AT")))
    val got = spark.read.parquet(target)
    assert(got.count() == 2)
    assert(got.filter(col("CUSTOMER_ID") === "8").head().getAs[String]("TAGS") == null,
      "missing columns null-fill (pandas concat alignment parity)")
  }
}
