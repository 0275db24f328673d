package graft.table

import java.nio.file.{Files, Paths}

/** Child process for the cross-JVM commit race spec: spin-waits on a start
  * barrier file so all contenders fire together, then attempts ONE
  * `putIfAbsent` of a distinctive payload and reports WIN/LOSE on stdout.
  * Kept Spark-free so a race of N children costs N bare JVM startups. */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(storeName, target, id, goFile) = args
    val store: CommitStore = storeName match {
      case "link" => LinkCommitStore
      // per-child seed: every process injects its own fault sequence
      case "faulty" => new FaultyCommitStore(ConditionalPutCommitStore,
        seed = id.toLong * 7919L)
      case _ => ConditionalPutCommitStore
    }
    // distinctive, self-delimiting payload: a torn/mixed write is detectable
    val payload = (s"writer-$id:" + ("x" * 65536) + s":end-$id").getBytes("UTF-8")
    val go = Paths.get(goFile)
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    while (!Files.exists(go) && System.nanoTime() < deadline) Thread.onSpinWait()
    val won = store.putIfAbsent(Paths.get(target), payload)
    println(if (won) s"WIN $id" else s"LOSE $id")
  }
}
