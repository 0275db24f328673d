package graft.queries

import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim=64 —
  * north-star extensions, SURVEY.md §2.12).
  *
  * s1 is the brute-force cosine top-k baseline: broadcast the query vector,
  * one map pass computing the dot product with a sequential higher-order fold
  * (`aggregate(zip_with(...))` — codegen'd, no UDF), then TakeOrderedAndProject
  * for the top-k (no global sort shuffle). At 100 TB this is the
  * scan-bound exact path.
  *
  * s2 is the IVF (inverted-file) scale path: partition vectors by nearest
  * centroid (here: a deterministic centroid subset — in production, k-means
  * trained offline), store bucketed by centroid, probe only the nearest
  * `n_probe` centroid buckets at query time — turning top-k from a full scan
  * into a pruned partition read. The bucketing shuffle happens once at write.
  *
  * Cross-engine exactness: dot products are double-precision sums over 64
  * terms ordered identically (sequential fold both engines), and every
  * similarity that is compared/ordered is first `round(..., 6)` so the two
  * engines rank identically.
  */
object SimilarityQueries {

  /** cosine(a, b) in Spark SQL higher-order functions (double fold). */
  private def cosExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, v) -> acc + v * v))
       |    * sqrt(aggregate($b, 0D, (acc, v) -> acc + v * v)))""".stripMargin

  /** cosine in DuckDB (list_sum over in-order transform = same fold). */
  private def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])))
       |    * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i]))))""".stripMargin

  /** s1: brute-force cosine top-10 neighbours of the vec_id=0 vector. */
  val s1CosineTopK: Q = Q(
    "s1_cosine_topk",
    (spark, dir) => {
      val e = Tables.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.crossJoin(broadcast(q))
        .withColumn("sim", expr(s"round(${cosExpr("v", "qv")}, 6)"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "sim")
    },
    Some(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT vec_id, label, round(${duckCos("v", "qv")}, 6) AS sim
         |FROM e, q
         |ORDER BY sim DESC, vec_id
         |LIMIT 10""".stripMargin))

  /** s2: IVF-style ANN — deterministic centroids (vec_id % 25 = 0), assign
    * every vector to its nearest centroid, probe the 4 centroids nearest the
    * query (vec_id=1), exact top-10 within the probed buckets. */
  val s2AnnIvf: Q = Q(
    "s2_ann_ivf",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      val cents = e.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      // assign: nearest centroid per vector (rounded sim, centroid-id tiebreak)
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("csim", expr(s"round(${cosExpr("v", "cv")}, 6)"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id"))))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("label"), col("v"), col("c_id"))
      val q = e.filter(col("vec_id") === 1).select(col("v").as("qv"))
      // probe the 4 centroids nearest the query
      val probed = cents.crossJoin(broadcast(q))
        .withColumn("qsim", expr(s"round(${cosExpr("cv", "qv")}, 6)"))
        .orderBy(col("qsim").desc, col("c_id")).limit(4)
        .select(col("c_id").as("probe_c"))
      assigned.join(broadcast(probed), col("c_id") === col("probe_c"))
        .crossJoin(broadcast(q))
        .withColumn("sim", expr(s"round(${cosExpr("v", "qv")}, 6)"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "c_id", "sim")
    },
    Some(
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id % 25 = 0),
         |assigned AS (
         |  SELECT vec_id, label, v, c_id FROM (
         |    SELECT e.vec_id, e.label, e.v, c.c_id,
         |      row_number() OVER (
         |        PARTITION BY e.vec_id
         |        ORDER BY round(${duckCos("e.v", "c.cv")}, 6) DESC, c.c_id) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
         |probed AS (
         |  SELECT c_id AS probe_c
         |  FROM cents, q
         |  ORDER BY round(${duckCos("cv", "qv")}, 6) DESC, c_id
         |  LIMIT 4)
         |SELECT vec_id, label, c_id, round(${duckCos("v", "qv")}, 6) AS sim
         |FROM assigned JOIN probed ON c_id = probe_c, q
         |ORDER BY sim DESC, vec_id
         |LIMIT 10""".stripMargin))

  val all: Seq[Q] = Seq(s1CosineTopK, s2AnnIvf)
}
