package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-off audit probe for the prefix-Jaccard pipeline's intermediate
  * cardinalities at a given SF dir — quantifies WHERE the shuffle bytes
  * of the q31 family go (shingle rows, prefix rows, candidate pairs,
  * candidate-doc shingle rows, counting-join meet rows), so shuffle
  * amplification findings in the scaling audit attach to a stage instead
  * of a guess. Debug tool: not part of the library surface. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val tau = 0.6
    val n = 3
    val spark = graft.core.GraftSession
      .builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val sh = Dedup.shingleHashes(docs, "doc_id", "text", n).cache()
    val nsh = sh.count()
    val ndocs = docs.count()
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("sz"))
    val prefix = sh.groupBy("_id")
      .agg(sort_array(collect_list(col("sh"))).as("_hs"), count(lit(1)).as("sz"))
      .withColumn("_plen",
        (col("sz") - ceil(lit(tau) * col("sz") - lit(1e-9)) + lit(1)).cast("int"))
      .select(col("_id"), explode(slice(col("_hs"), lit(1), col("_plen"))).as("sh"))
      .cache()
    val npfx = prefix.count()
    val cands = prefix.as("x").join(prefix.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
    val nCandRows = cands.count()       // pre-distinct meet rows (hash order)
    val candsD = cands.distinct().cache()
    val nCands = candsD.count()         // hash-order candidates
    val nFreqCands = Dedup.prefixCandidates(sh, tau).count() // freq-order
    val candIds = candsD.select(col("a").as("_id"))
      .unionByName(candsD.select(col("b").as("_id"))).distinct().cache()
    val nCandDocs = candIds.count()
    val shc = sh.join(candIds, Seq("_id")).cache()
    val nShc = shc.count()
    val meet = shc.as("x").join(shc.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") < col("y._id"))
    val nMeet = meet.count()
    val meetSemi = meet.join(candsD,
      col("x._id") === col("a") && col("y._id") === col("b"), "left_semi")
    val nMeetSemi = meetSemi.count()
    val dense = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") < col("y._id"))
    val nDense = dense.count()
    println(s"docs=$ndocs shingleRows=$nsh prefixRows=$npfx " +
      s"candMeetRows=$nCandRows candPairsHashOrder=$nCands freqOrderCandPairs=$nFreqCands " +
      s"candDocs=$nCandDocs " +
      s"candShingleRows=$nShc verifyMeetRows=$nMeet verifyMeetSemiRows=$nMeetSemi " +
      s"denseMeetRows=$nDense")
    spark.stop()
  }
}
