package graft.etl

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Entry point C evidence: the REAL reference native-job document
  * (`/root/reference/example/native-spark-job-scheduler.yaml`) must parse —
  * configMap-fed `$(VAR)` argument substitution, sparkConf, restart policy —
  * and a registered native job must run under that policy. */
class SparkAppSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val refYaml = "/root/reference/example/native-spark-job-scheduler.yaml"

  test("the reference native-spark-job-scheduler.yaml parses") {
    val app = SparkApp.fromFile(refYaml, env = Map("codeBucket" -> "mybucket"))
    assert(app.name === "word-count")
    assert(app.mainFile === "wordcount.py")
    // $(BUCKET_PARAM) resolves through driver.env's configMapKeyRef
    assert(app.arguments === Seq("s3a://mybucket/app_code/output/native"))
    assert(app.sparkConf("spark.io.encryption.enabled") === "true")
    assert(app.sparkConf.size === 5)
    // restartPolicy (O5): 3 on-failure retries, 10s interval
    assert(app.retries === 3 && app.retryIntervalMs === 10000L)
  }

  test("a registered native job runs under the restart policy") {
    val out = tmpDir("sa-") + "/wc"
    val yaml =
      """apiVersion: "sparkoperator.k8s.io/v1beta2"
        |kind: SparkApplication
        |metadata: {name: wc-test}
        |spec:
        |  mainApplicationFile: "file:///wordcount.py"
        |  arguments: ["$(OUT)"]
        |  sparkConf: {"graft.native.flag": "on"}
        |  restartPolicy: {onFailureRetries: 2, onFailureRetryInterval: 0}
        |  driver:
        |    env:
        |      - name: OUT
        |        value: "OUT_DIR"
        |""".stripMargin.replace("OUT_DIR", out)
    val app = SparkApp.fromYaml(yaml)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val wordcount: (org.apache.spark.sql.SparkSession, Seq[String]) => Unit =
      (s, args) => {
        if (attempts.incrementAndGet() == 1)
          throw new RuntimeException("transient failure")
        assert(s.conf.get("graft.native.flag") === "on") // conf visible in-job
        Seq("a b a", "b a").toDF("line")
          .selectExpr("explode(split(line, ' ')) AS word")
          .groupBy("word").count()
          .write.mode("overwrite").parquet(args.head)
      }
    SparkApp.run(spark, app, Map("wordcount.py" -> wordcount))
    assert(attempts.get() === 2) // failed once, retried, succeeded
    val got = spark.read.parquet(out).as[(String, Long)].collect().toSet
    assert(got === Set(("a", 3L), ("b", 2L)))
    assert(spark.conf.getOption("graft.native.flag").isEmpty) // restored
  }
}
