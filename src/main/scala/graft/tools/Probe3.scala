package graft.tools

import org.apache.spark.sql.SparkSession

/** q31 isolation probe: noop-write it three times in a fresh JVM. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; e <- si.completionTime
        } yield (e - s) / 1000.0
        println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"dur=${dur.getOrElse(-1.0)}%8.2f s  ${si.name.take(60)}")
      }
    })
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      graft.Queries.q31DedupNgram(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[probe3] q31#$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
