package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
