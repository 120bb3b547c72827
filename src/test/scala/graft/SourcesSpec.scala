package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  test("readJsonEnvelope explodes the data array with the declared schema") {
    val dir = Files.createTempDirectory("env").toString
    val json =
      """{"metadata": {"table": "customers", "recordCount": 2,
        |              "generatedAt": "2024-01-01T00:00:00", "version": "1.0"},
        | "data": [
        |  {"customer_id": "C1", "name": "Ann", "address": {"city": "Berlin", "zip": "10115"},
        |   "tags": ["a", "b"]},
        |  {"customer_id": "C2", "name": "Bo", "address": {"city": "Paris", "zip": "75001"},
        |   "tags": []}
        | ]}""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/customers.json"), json)
    val record = StructType(Seq(
      StructField("customer_id", StringType),
      StructField("name", StringType),
      StructField("address", StructType(Seq(
        StructField("city", StringType), StructField("zip", StringType)))),
      StructField("tags", ArrayType(StringType))))
    val df = Sources.readJsonEnvelope(spark, s"$dir/customers.json", record)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("customer_id", "name", "address", "tags"))

    val flat = Sources.flatten(df)
    assert(flat.columns.toSeq == Seq("customer_id", "name", "address_city", "address_zip", "tags"))
    val r = flat.orderBy("customer_id").collect()
    assert(r(0).getAs[String]("address_city") == "Berlin")
    assert(r(0).getAs[String]("tags") == """["a","b"]""") // array → JSON string
  }

  test("readCsv applies the declared schema without inference") {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "id,qty,price\n1,2,3.5\n2,notanum,4.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType),
      StructField("price", DoubleType)))
    val df = Sources.readCsv(spark, s"$dir/t.csv", schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(1)) // malformed int → null (non-ANSI)
    assert(rows(0).getDouble(2) == 3.5)
  }

  test("upperColumns uppercases every column name") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("order_id", "status")
    assert(Sources.upperColumns(df).columns.toSeq == Seq("ORDER_ID", "STATUS"))
  }

  test("JDBC roundtrip against embedded Derby proves S3/S6 beyond the seam") {
    import spark.implicits._
    import graft.sources.Writers
    // Derby ships on the Spark unmanaged classpath — a real embedded
    // database, no network, same JDBC code path as a warehouse endpoint.
    System.setProperty("derby.stream.error.file",
      Files.createTempDirectory("derbylog").resolve("derby.log").toString)
    val db = Files.createTempDirectory("graft_jdbc_").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")

    Writers.writeJdbc(df, url, "t_roundtrip")
    val back = Sources.readJdbc(spark, url, "t_roundtrip")
    assert(back.count() == 100)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)

    // partitioned read: the scan splits into bounded-range queries
    val part = Sources.readJdbc(spark, url, "t_roundtrip",
      partitionColumn = Some(("id", 1L, 100L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)

    // overwrite is idempotent (the warehouse-sink contract)
    Writers.writeJdbc(df.filter($"id" <= 10), url, "t_roundtrip")
    assert(Sources.readJdbc(spark, url, "t_roundtrip").count() == 10)
  }

  test("S3A seam: exercised when hadoop-aws resolves; documented skip otherwise") {
    // Every reader/writer takes any Hadoop path, so s3a:// needs zero code
    // changes — only hadoop-aws + an AWS SDK on the classpath. This
    // sandbox is zero-egress and ships neither in /opt/spark/jars nor the
    // offline coursier cache (and unlike JDBC there is no embeddable
    // in-JVM S3 without new dependencies), so the live path remains a
    // deployment concern (SURVEY §7.5). The assume() below makes that an
    // explicit, visible CANCELED-with-reason rather than silent absence;
    // in any environment that ships hadoop-aws the test runs and proves
    // the scheme→filesystem wiring end to end.
    val present =
      try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
      catch { case _: ClassNotFoundException => false }
    assume(present,
      "hadoop-aws is not on the offline classpath — s3a:// is exercised in deployment")
    val fs = new org.apache.hadoop.fs.Path("s3a://bucket/key")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getScheme == "s3a")
  }
}
