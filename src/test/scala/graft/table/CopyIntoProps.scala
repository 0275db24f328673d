package graft.table

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

import java.nio.file.{Files, Paths}

/** Exactly-once property for COPY INTO over random landing histories: for
  * ANY interleaving of "land a file" (new name or overwrite) and "copy"
  * operations, the table's rows equal the reference model — the set of
  * every (landing, file) state that SOME copy observed — with nothing
  * ingested twice and nothing observed-then-forgotten. Landings get
  * strictly increasing mtimes so each overwrite is a distinct source
  * identity (the production contract: a modified file re-ingests). */
object CopyIntoProps extends Properties("CopyInto") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private sealed trait Op
  private case class Land(name: String) extends Op
  private case object Copy extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.oneOf("a", "b", "c").map(Land(_)),
    2 -> Gen.const(Copy))
  private val opsGen: Gen[List[Op]] =
    Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, opGen))

  property("any land/copy interleaving ingests each landed state exactly once") =
    Prop.forAll(opsGen) { ops =>
      val base = tmpDir("cip-")
      val src = s"$base/src"
      Files.createDirectories(Paths.get(src))
      val t = VersionedTable(s"$base/t")
      t.commit(Seq.empty[(Long, String)].toDF("id", "k"))
      var counter = 0L
      var onDisk = Map.empty[String, Long] // name -> landing counter
      var ingested = Set.empty[(String, Long)] // reference model
      ops.foreach {
        case Land(name) =>
          counter += 1
          val stage = Files.createTempDirectory("cip-stage-")
          Seq((counter, name)).toDF("id", "k")
            .coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val part = Files.list(stage).iterator()
          var p: java.nio.file.Path = null
          while (part.hasNext) { val x = part.next()
            if (x.getFileName.toString.endsWith(".parquet")) p = x }
          val dst = Paths.get(src, s"$name.parquet")
          Files.copy(p, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // unique mtime per landing: an overwrite is a NEW source identity
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + counter * 1000))
          onDisk += name -> counter
        case Copy =>
          t.copyInto(spark, src)
          ingested ++= onDisk.map { case (n, c) => (n, c) }
      }
      val got = t.read(spark).as[(Long, String)].collect().sorted.toSeq
      val want = ingested.toSeq.map { case (n, c) => (c, n) }.sorted
      Prop(got == want) :| s"ops=$ops got=$got want=$want"
    }
}
