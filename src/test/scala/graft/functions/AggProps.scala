package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Distribution-independence properties for the engine's bounded
  * aggregates: whatever the partitioning (and therefore whatever
  * partial/merge tree Spark picks), `top_k_by` must equal the window-rank
  * reference and `vec_sum_u6` must equal the posexplode round-sum
  * reference. Random negative magnitudes exercise the decimal HALF_UP
  * rounding and the tie rules; random partition counts exercise the
  * map-side combine and merge paths. */
object AggProps extends Properties("GraftAggregates") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  GraftFunctions.registerAll(spark)

  private val topKRows: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0L, 3L)
      k <- Gen.chooseNum(0L, 9L)
      // coarse ord values force ties, exercising the lower-key tie rule
      o <- Gen.chooseNum(-3, 3).map(_ * 0.5)
    } yield (g, k, o))
  } yield rows

  property("top_k_by equals the window-rank reference under any partitioning") =
    Prop.forAll(topKRows, Gen.chooseNum(1, 4), Gen.chooseNum(1, 8)) { (rows, k, parts) =>
      // distinct (group, key): the aggregate collapses exact (ord, key)
      // duplicates (set semantics), which its candidate streams never carry
      val data = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = data.toDF("g", "k", "o").repartition(parts)
      df.createOrReplaceTempView("tk_in")
      val got = spark.sql(s"SELECT g, top_k_by(k, o, $k) AS ks FROM tk_in GROUP BY g")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val want = data.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._3, r._2)).sortBy { case (o, kk) => (-o, kk) }
          .take(k).map(_._2).toList
      }
      Prop(got == want) :| s"got $got, want $want"
    }

  private val vecRows: Gen[List[(Long, List[Double])]] = for {
    n <- Gen.chooseNum(1, 30)
    dim <- Gen.chooseNum(1, 8)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0L, 2L)
      v <- Gen.listOfN(dim, Gen.chooseNum(-4000000, 4000000).map(_ / 1000.0))
    } yield (g, v))
  } yield rows

  property("vec_sum_u6 equals the posexplode round-sum under any partitioning") =
    Prop.forAll(vecRows, Gen.chooseNum(1, 8)) { (rows, parts) =>
      val df = rows.map { case (g, v) => (g, v.toArray) }.toDF("g", "v")
        .repartition(parts)
      df.createOrReplaceTempView("vs_in")
      val got = spark.sql("SELECT g, vec_sum_u6(v) AS s FROM vs_in GROUP BY g")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val want = spark.sql(
        """SELECT g, i, CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS s
          |FROM (SELECT g, posexplode(v) AS (i, x) FROM vs_in)
          |GROUP BY g, i""".stripMargin)
        .collect().groupBy(_.getLong(0))
        .map { case (g, rs) => g -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toList }
      Prop(got == want) :| s"got $got, want $want"
    }
}
