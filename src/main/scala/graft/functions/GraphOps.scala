package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
  * converges in O(log n) rounds on ANY graph shape — the upgrade path the
  * O(diameter) label-propagation loop needs for chain-shaped components.
  *
  * Each round is two grouped aggregations over the edge list:
  *  - large-star: every node u links its neighbors v > u to
  *    m(u) = min(N(u) ∪ {u});
  *  - small-star: every node u links its neighbors v ≤ u (and itself) to m(u).
  * The edge set monotonically contracts toward stars rooted at each
  * component's minimum id; all data stays distributed (the driver only
  * steers on a convergence counter). */
object GraphOps {

  /** (node, component) for every node appearing in `edges` (src/dst Long
    * columns; undirected, self-loops ignored). Component = min node id
    * reachable. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // localCheckpoint (eager) after every round: persist alone caches DATA
    // but the logical plan keeps growing across iterations and Catalyst
    // re-analyzes the whole accumulated tree each round — the standard
    // iterative-algorithm trap. Checkpointing truncates the lineage so each
    // round's plan is constant-size.
    var e = edges.select(col(edges.columns(0)).as("u"), col(edges.columns(1)).as("v"))
      .filter($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct().localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the symmetric view: link v > u to m(u)
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy("u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      val large = sym.join(mins, "u").filter($"v" > $"u")
        .select(least($"v", $"m").as("u"), greatest($"v", $"m").as("v"))
        .filter($"u" =!= $"v").distinct()
      // small-star: link v <= u (and u itself) to m(u)
      val sym2 = large.union(large.select($"v".as("u"), $"u".as("v")))
      val mins2 = sym2.groupBy("u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      val small = sym2.join(mins2, "u").filter($"v" <= $"u")
        .select($"v", $"m").union(mins2.select($"u", $"m"))
        .select(least($"v", $"m").as("u"), greatest($"v", $"m").as("v"))
        .filter($"u" =!= $"v").distinct().localCheckpoint(true)
      // both sides are distinct sets, so equal counts + empty one-sided
      // difference ⇒ equality — one subtraction job instead of two
      converged = small.count() == e.count() && small.exceptAll(e).isEmpty
      e.unpersist() // drop the superseded checkpoint's storage promptly
      e = small
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds")
    // stars: u is the component root for each (u, v); roots map to themselves
    e.select($"v".as("node"), $"u".as("component"))
      .union(e.select($"u".as("node"), $"u".as("component")))
      .groupBy("node").agg(min("component").as("component"))
  }
}
