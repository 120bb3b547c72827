package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source readers + schema utilities — SURVEY.md §2.1 (S1-S3) and §1.2.
  *
  * The reference ingests an "envelope" JSON document
  * `{"metadata": {...}, "data": [ {record}... ]}` per table
  * (ref: 0_generate_historic_synthetic_data.py:436-444, reader at
  * ingest_latest_synthetic_data.py:131-146), CSVs with headers, and
  * Postgres tables. Spark-first: declared schemas (never end-to-end
  * inference), `explode` for the envelope array, and a recursive
  * select-flattener replacing pandas `json_normalize(sep='_')`.
  */
object Sources {

  /** Envelope wrapper for a per-table record schema. */
  def envelopeSchema(record: StructType): StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("table", StringType),
      StructField("recordCount", LongType),
      StructField("generatedAt", StringType),
      StructField("version", StringType)))),
    StructField("data", ArrayType(record))))

  /** S1: read an envelope JSON file into one row per `data[]` record.
    * multiLine because the envelope is a single document, not JSONL. */
  def readJsonEnvelope(spark: SparkSession, path: String, record: StructType): DataFrame =
    spark.read
      .schema(envelopeSchema(record))
      .option("multiLine", value = true)
      .json(path)
      .select(explode(col("data")).as("r"))
      .select(col("r.*"))

  /** S2: header CSV with a declared schema (no inference pass over data). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", value = true).csv(path)

  /** S3: JDBC reader — roundtrip-proven against embedded Derby
    * (SourcesSpec); live warehouse endpoints are a deployment concern
    * (SURVEY §7.5). Partitioned reads keep the scan distributed at scale. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }

  /** Generic flatten — pandas `json_normalize(sep='_')` parity
    * (ref: ingest_latest_synthetic_data.py:246-276): nested structs become
    * `parent_child` scalar columns; arrays are re-serialized to JSON
    * strings. Pure projection: one codegen'd pass, no shuffle. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def cols(schema: StructType, prefix: Seq[String]): Seq[Column] =
      schema.fields.flatMap { f =>
        val path = prefix :+ f.name
        val c = col(path.map(p => s"`$p`").mkString("."))
        f.dataType match {
          case s: StructType => cols(s, path)
          case _: ArrayType => Seq(to_json(c).as(path.mkString(sep)))
          case _ => Seq(c.as(path.mkString(sep)))
        }
      }
    df.select(cols(df.schema, Nil): _*)
  }

  /** Uppercase all column names — raw-layer convention
    * (ref: ingest_latest_synthetic_data.py:203). */
  def upperColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toUpperCase): _*)
}
