package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.ecom.EcomFixture

/** Governance of the medallion landing (the r17 skew100 cliff): the full
  * DAG materialization is O(input) REAL disk — measured 3.5x the raw
  * parquet inputs (5.9 GiB at skew10), which extrapolates to ~59 GiB at
  * skew100 and ENOSPC'd the rung before the fence existed. Contract:
  *  - `marts` refuses past `graft.maxEcomLandingBytes` (estimate = input
  *    bytes x measured factor, rounded up), naming the knob and the twin;
  *  - `qa_schema_tests_stream` lands only the shared interior tier and
  *    streams the leaf fct_* marts through their fused checks — identical
  *    output frame, same oracle SQL, ~half the landing estimate.
  */
class QaLandingFenceSpec extends SparkSpec {

  private def frameOf(key: String): DataFrame =
    SparkEntry.queries(key)(spark, sfDir)

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  test("the stream twin emits the identical 150-check frame") {
    val main = frameOf("qa_schema_tests").collect().map(_.toString).sorted
    val twin = frameOf("qa_schema_tests_stream").collect().map(_.toString).sorted
    assert(main.length == 150, s"expected the full matrix, got ${main.length}")
    assert(main.sameElements(twin),
      "stream twin diverged from qa_schema_tests on the fixture corpus")
  }

  test("the twin scans no landed fct mart and no pre-materialized src copy") {
    // main key: leaf marts are landed parquet -> /fct_* scan paths appear
    val mainPaths = scannedPaths(frameOf("qa_schema_tests"))
    assert(mainPaths.exists(_.contains("/fct_")),
      s"expected landed fct scans in the main key's plan: $mainPaths")
    // twin: fct checks rebuild from the landed interior -> zero fct paths
    val twinPaths = scannedPaths(frameOf("qa_schema_tests_stream"))
    assert(!twinPaths.exists(_.contains("/fct_")),
      s"twin still reads a landed fct mart: ${twinPaths.filter(_.contains("/fct_"))}")
    assert(twinPaths.exists(_.contains("graft_ecom_")),
      "twin should read the LANDED interior tier (orders/order_items/dims)")
    // src_*/stg_* stream as pruned raw scans in BOTH plans since the r17
    // rework — the residual graft_qa_ tier is the (small, multi-scanned)
    // dim_* Views only
    Seq(mainPaths, twinPaths).foreach { p =>
      val copies = p.filter(x => x.contains("graft_qa_") &&
        (x.contains("/src_") || x.contains("/stg_")))
      assert(copies.isEmpty,
        s"src/stg tier was pre-materialized instead of streamed: $copies")
    }
  }

  test("the landing fence refuses the full landing and admits the streamed one") {
    val s2 = spark.newSession()
    // pin the budget BETWEEN the streamed (2x) and full (4x) estimates
    val in = EcomFixture.inputBytes(sfDir)
    s2.conf.set("graft.maxEcomLandingBytes", (3L * in).toString)
    val e = intercept[IllegalArgumentException] { EcomFixture.marts(s2, sfDir) }
    assert(e.getMessage.contains("graft.maxEcomLandingBytes") &&
      e.getMessage.contains("qa_schema_tests_stream"),
      s"fence must name the knob and the twin: ${e.getMessage}")
    // the governed twin fits the same budget and actually runs
    assert(EcomFixture.martsStreamed(s2, sfDir).nonEmpty)
  }
}
