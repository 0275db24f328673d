package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Large-star/small-star connected components vs a driver-side union-find
  * reference on random graphs — including long chains, the shape that
  * defeats O(diameter) label propagation. */
object GraphOpsProps extends Properties("GraphOps") with SparkSpec {
  import spark.implicits._

  // each case runs a full multi-round distributed algorithm (persist +
  // convergence checks per round) — 20 diverse graphs per property is the
  // honest budget, not ScalaCheck's default 100
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // component label = min node id in the component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  private val randomEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 40)
    es <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 30L)
      b <- Gen.chooseNum(0L, 30L)
    } yield (a, b))
  } yield es

  private val chainEdges: Gen[Seq[(Long, Long)]] =
    Gen.chooseNum(2, 12).map(len => (0L until len).map(i => (i, i + 1)))

  private def check(es: Seq[(Long, Long)]): Boolean = {
    val edges = es.filter { case (a, b) => a != b }
    if (edges.isEmpty) true
    else {
      val got = GraphOps.connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val want = unionFind(nodes, edges)
      got == want
    }
  }

  property("matches union-find on random graphs") =
    Prop.forAll(randomEdges)(check)

  property("matches union-find on chains (worst case for label propagation)") =
    Prop.forAll(chainEdges)(check)
}
