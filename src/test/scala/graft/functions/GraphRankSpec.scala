package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory reference of the same integer iteration. */
  private def refRank(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> GraphRank.NodeMassMicro).toMap
    for (_ <- 0 until iterations) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        contrib(d) += r(s) / deg(s)
      }
      r = nodes.map(n => n ->
        (GraphRank.BaseMicro + GraphRank.DampNum * contrib(n) / GraphRank.DampDen)).toMap
    }
    r
  }

  private val ring: Seq[(Long, Long)] =
    (0L until 10L).map(i => (i, (i + 1) % 10))
  private val star: Seq[(Long, Long)] =
    (1L to 8L).map(i => (i, 0L)) ++ Seq((0L, 1L))

  test("matches the in-memory reference iteration exactly on hand graphs") {
    for ((g, name) <- Seq((ring, "ring"), (star, "star"), (ring ++ star.map {
        case (a, b) => (a + 100L, b + 100L) }, "disjoint"))) {
      val got = GraphRank.pageRankMicro(g.toDF("src", "dst"), "src", "dst", 5)
        .as[(Long, Long)].collect().toMap
      assert(got === refRank(g, 5), name)
    }
  }

  test("centrality ordering: the star hub outranks its leaves; ring is uniform") {
    val r = GraphRank.pageRankMicro(star.toDF("src", "dst"), "src", "dst", 5)
      .as[(Long, Long)].collect().toMap
    assert((1L to 8L).forall(l => r(0L) > r(l)), s"hub must outrank leaves: $r")
    val rr = GraphRank.pageRankMicro(ring.toDF("src", "dst"), "src", "dst", 5)
      .as[(Long, Long)].collect().toMap
    assert(rr.values.toSet.size === 1, s"symmetric ring must be uniform: $rr")
  }

  test("partitioning-invariant (exact integer arithmetic)") {
    val g = (0 until 500).map(i => ((i % 83).toLong, ((i * 7 + 1) % 83).toLong))
      .filter { case (a, b) => a != b }.distinct
    val a = GraphRank.pageRankMicro(g.toDF("src", "dst").repartition(1), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    val b = GraphRank.pageRankMicro(g.toDF("src", "dst").repartition(13), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
