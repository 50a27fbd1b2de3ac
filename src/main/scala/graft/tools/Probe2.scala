package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeatability probe: same action N times. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val sh = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      sh.count()
      println(f"[probe2] shingles#$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
