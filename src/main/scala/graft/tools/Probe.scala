package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling probe (not part of the library surface). */
object Probe {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, dir, "documents")

    time("docs count")(docs.count())
    val sh = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles count")(sh.count())
    time("shingles count again")(sh.count())
    val shh = graft.operators.Dedup.shingleHashes(docs, "doc_id", "text", 3)
    time("shingleHashes count")(shh.count())
    val cached = shh.cache()
    time("cache materialize")(cached.count())
    val sizes = cached.groupBy("_id").agg(count(lit(1)).as("sz"))
    time("sizes")(sizes.count())
    val common = cached.as("x").join(cached.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("common"))
    time("common join+agg")(common.count())
    time("full q31")(graft.Queries.q31DedupNgram(spark, dir).count())
    spark.stop()
  }
}
