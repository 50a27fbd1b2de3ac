package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` output for the named registered queries
  * to `<outDir>/<query><suffix>.txt` — the round's plan-evidence artifacts
  * (plans/rN/<query>_before.txt / _after.txt). Planning only, no jobs,
  * except that queries whose builders run eager sizing probes (head() on
  * an aggregate, localCheckpoint) execute those probe jobs as part of
  * building the final DataFrame — the dumped plan is the one the noop
  * sink would execute. The optional conf list forces scale-gated paths
  * (e.g. graft.spandedup.hashGateMinRows=0) so a plan that only engages
  * at large SF can be evidenced from the small test dirs. Usage:
  *   DumpPlans <sfDir> <outDir> <suffix> <q1,q2,...> [k=v,k=v,...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val keys = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 4) args(4).split(",").map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        // a conf entry without '=' is a typo in the invocation — fail the
        // run with a named error instead of a bare MatchError (r14 ADVICE)
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ =>
            System.err.println(s"[plans] malformed conf entry '$kv' (need k=v)")
            spark.stop(); sys.exit(2)
        }
      }
    Files.createDirectories(Paths.get(outDir))
    // A query whose dump fails must fail the INVOCATION (non-zero exit),
    // or a missing plan-evidence file goes unnoticed and a stale
    // before/after artifact gets mistaken for current (r14 ADVICE).
    var nFailed = 0
    keys.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plans] wrote $name$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          nFailed += 1
          System.err.println(s"[plans] $name failed: $e")
      }
    }
    spark.stop()
    if (nFailed > 0) {
      System.err.println(s"[plans] $nFailed of ${keys.length} dumps FAILED")
      sys.exit(1)
    }
  }
}
