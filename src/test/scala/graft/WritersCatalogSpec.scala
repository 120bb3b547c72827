package graft

import java.nio.file.{Files, Paths}

import graft.sources.Writers

class WritersCatalogSpec extends SparkSpec {

  test("writeCsvWithMetadata writes data + manifest with count/schema/min date") {
    import spark.implicits._
    val dir = Files.createTempDirectory("w").toString
    val df = Seq((1L, "2024-01-03"), (2L, "2024-01-01"))
      .toDF("id", "d").select($"id", $"d".cast("date").as("d"))
    Writers.writeCsvWithMetadata(df, s"$dir/t.csv", s"$dir/t_metadata.json", Some("d"))
    val back = spark.read.option("header", "true").csv(s"$dir/t.csv")
    assert(back.count() == 2)
    val meta = Files.readString(Paths.get(s"$dir/t_metadata.json"))
    assert(meta.contains(""""record_count": 2"""))
    assert(meta.contains(""""min_date": "2024-01-01""""))
    assert(meta.contains(""""id": "bigint""""))
  }

  test("catalog probes: registered tables, columns, counts (S9 parity)") {
    Tables.registerAll(spark, sfDir)
    val tables = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Tables.names.toSet.subsetOf(tables))
    val cols = spark.catalog.listColumns("lineitem").collect().map(_.name)
    assert(cols.contains("l_orderkey") && cols.contains("l_shipdate"))
    assert(spark.table("region").count() > 0)
    assert(spark.table("nation").limit(5).count() == 5)
  }
}
