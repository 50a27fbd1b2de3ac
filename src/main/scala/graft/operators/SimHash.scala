package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection.
  *
  * Each document's simhash is the sign-vector of per-bit vote sums over its
  * token hashes (+1 if the token hash has the bit set, else -1). Documents
  * within Hamming distance `maxHamming` are near-duplicates.
  *
  * Scale design (SURVEY §4): the 64 per-bit vote sums are 64 aggregate
  * expressions in one hash-agg pass (map-side combine; one long row per doc
  * after the shuffle). Pair generation uses the pigeonhole block trick: the
  * 64-bit hash splits into 4 blocks of 16 — any pair within Hamming <= 3
  * agrees on at least one whole block, so candidates come from an equi-join
  * on (block index, block value), never a cross join.
  */
object SimHash {

  /** (id, simhash long) per document, from whitespace tokens. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"_v$i")
    }
    val bits = (0 until 64).map { i =>
      when(col(s"_v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }
    toks.groupBy("_id").agg(votes.head, votes.tail: _*)
      .select(col("_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs (a < b) with Hamming distance <= maxHamming (<= 15:
    * the 4x16 pigeonhole guarantee covers up to 3; wider thresholds would
    * need more blocks). */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4 blocks of 16 bits guarantee recall only for hamming <= 3")
    val sig = simhashes(df, idCol, textCol)
    val blocks = array((0 until 4).map { j =>
      shiftrightunsigned(col("simhash"), j * 16).bitwiseAND(0xFFFFL)
    }: _*)
    val blocked = sig.select(col("_id"), col("simhash"), posexplode(blocks).as(Seq("blk", "bv")))
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"),
        col("x.simhash").as("_sa"), col("y.simhash").as("_sb"))
      .distinct()
      .withColumn("hamming", bit_count(col("_sa").bitwiseXOR(col("_sb"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }
}
