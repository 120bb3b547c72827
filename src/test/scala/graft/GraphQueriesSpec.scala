package graft

import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** Semantic checks for the graph pack beyond the oracle's value-equality:
  * PageRank's structural invariants (mass floor, parity namespacing,
  * rerun determinism) and the degree profile's conservation law. */
class GraphQueriesSpec extends SparkSpec {

  test("graph_pagerank: every node holds at least the restart mass") {
    val rows = GraphQueries.queries("graph_pagerank")(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("mass") >= 150000L,
        s"node ${r.getAs[Long]("node")} below the integer restart floor")
      val kind = r.getAs[String]("kind")
      val node = r.getAs[Long]("node")
      assert(if (node % 2 == 0) kind == "cust" else kind == "supp",
        s"parity namespacing broken for node $node -> $kind")
    }
  }

  test("graph_pagerank is rerun-deterministic (integer arithmetic)") {
    val a = GraphQueries.queries("graph_pagerank")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = GraphQueries.queries("graph_pagerank")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "two runs of the integer PageRank diverged")
  }

  test("graph_degree_dist conserves nodes and edge endpoints") {
    val dist = GraphQueries.queries("graph_degree_dist")(spark, sfDir).collect()
    val nNodes = dist.map(_.getAs[Long]("n_nodes")).sum
    val endpoints = dist.map(r => r.getAs[Long]("deg") * r.getAs[Long]("n_nodes")).sum
    // symmetric bipartite graph: every distinct (cust, supp) pair
    // contributes one out-edge on each side
    val pairs = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    assert(endpoints == 2 * pairs,
      s"degree-weighted node count $endpoints != 2x distinct pairs $pairs")
    val nCust = Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(nNodes >= nCust, "fewer graph nodes than ordering customers")
  }
}
