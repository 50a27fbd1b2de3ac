package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table-loading helpers.
  *
  * Defaults are chosen for the 100 TB design point, scaled to local[32]:
  * AQE on (runtime skew-join splitting + shuffle-partition coalescing),
  * shuffle.partitions matched to cores locally (on a real cluster this is
  * sized to ~2-3x total executor cores / managed by AQE).
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Loads the benchmark tables (one parquet per table under a scale-factor dir). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
