package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column-level functions for the engine's vector / text operators —
  * the library API a user composes with (`import graft.functions._` style).
  * All are pure `org.apache.spark.sql.functions` higher-order compositions:
  * codegen'd, no UDFs, no shuffle (SURVEY.md §2.10 preference order (a)/(b)).
  */
object VectorFunctions {

  /** Sequential-fold dot product over two equal-length double arrays.
    * Fold order is left-to-right, which keeps results bit-identical across
    * engines that fold the same way (the DuckDB oracle's list_sum).
    * Backed by the native codegen [[DotProduct]] expression — semantics
    * identical to `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
    * (acc, v) -> acc + v)` (incl. NULL on null element or length
    * mismatch), but a tight primitive loop instead of the interpreted
    * CodegenFallback HOF chain that dominated every pairwise scan. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.PlanShim.column(DotProduct(
      org.apache.spark.sql.graft.PlanShim.expression(a.cast("array<double>")),
      org.apache.spark.sql.graft.PlanShim.expression(b.cast("array<double>"))))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSim(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine with precomputed norms: bit-identical to [[cosineSim]] (same
    * expression, norms just evaluated once per vector instead of per pair) —
    * the right shape for pairwise scans, where norm recompute is the
    * dominant redundant cost. */
  def cosineWithNorms(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  def cosineWithNorms6(a: Column, na: Column, b: Column, nb: Column): Column =
    round(cosineWithNorms(a, na, b, nb), 6)

  /** Cosine rounded for deterministic cross-engine ranking (6dp — both Spark
    * and DuckDB round by shortest-decimal-repr half-up). */
  def cosineSim6(a: Column, b: Column): Column = round(cosineSim(a, b), 6)

  /** Squared L2 distance (the PQ distance fold) — native [[SquaredL2]],
    * bit-identical to the zip_with/aggregate composition. */
  def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.PlanShim.column(SquaredL2(
      org.apache.spark.sql.graft.PlanShim.expression(a.cast("array<double>")),
      org.apache.spark.sql.graft.PlanShim.expression(b.cast("array<double>"))))

  def l2Dist(a: Column, b: Column): Column = sqrt(l2sq(a, b))
}

/** Text-side Column functions: tokenization, shingling, set similarity. */
object TextFunctions {

  def whitespaceTokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** Word n-gram shingles (space-joined), per-row. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** Jaccard similarity of two shingle arrays (distinct-set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    inter.cast("double") / (size(da) + size(db) - inter)
  }
}
