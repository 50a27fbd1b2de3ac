package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage shuffle/spill diagnostic: runs one registered query and
  * prints one line per completed stage (shuffle write/read, memory/disk
  * spill, peak execution memory, task count, and the stage's plan-site
  * line) so a board-level `spill_mb` number can be attributed to the
  * exact exchange/sort/aggregate that produced it. Usage:
  *   ProbeStages <sfDir> <queryKey> [cpus]
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val key = args(1)
    val cpus = if (args.length > 2) args(2) else "32"
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val site = si.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("ProbeStages"))
          .getOrElse("").trim
        println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%5d " +
          f"swr=${m.shuffleWriteMetrics.bytesWritten / 1e9}%7.2fG " +
          f"srd=${(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / 1e9}%7.2fG " +
          f"spillM=${m.memoryBytesSpilled / 1e9}%7.2fG " +
          f"spillD=${m.diskBytesSpilled / 1e9}%7.2fG " +
          f"peak=${m.peakExecutionMemory / 1e9}%6.2fG " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%7.1fs " +
          s"name=${si.name.take(60)} site=$site")
      }
    })
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(key)(spark, dir)
    println(s"ROWS ${df.count()}")
    println(f"WALL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
