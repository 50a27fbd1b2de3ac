package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Packs ordered rows into contiguous budget-bounded shards — the
  * training-data step that turns a deduped corpus into size-bounded
  * shards (≈ token-budget file packing).
  *
  * Each row gets its running weight total (`SUM(w) OVER (ORDER BY ...)`)
  * and the shard index `(cum - 1) div budget`: shards are contiguous in
  * the given order and a row belongs to the shard where its own weight
  * ENDS. The naive formulation is a single-partition window — the same
  * 100 TB non-starter [[GlobalIndex]] exists for — so the same machinery
  * computes it distributed: ONE range shuffle materialized as one RDD, a
  * per-partition weight-total job (one long per partition, prefix-summed
  * on the driver), and an emit job over the same shuffle files adding
  * offset + partition-local running sum. Boundaries are sampled exactly
  * once; the oracle checks the full assignment bit-for-bit.
  */
object Packing {

  /** @param order     columns forming a TOTAL order (add a unique tiebreak)
    * @param weightCol integral weight column (tokens, bytes, chars …)
    * @param budget    max cumulative weight per shard (> 0); a single row
    *                  heavier than the budget still lands in exactly one
    *                  shard (the one where its weight ends)
    * @param cumCol    appended running-total column name
    * @param shardCol  appended 0-based shard index column name */
  def packByBudget(
      df: DataFrame, order: Seq[String], weightCol: String, budget: Long,
      cumCol: String, shardCol: String): DataFrame = {
    require(budget > 0, "need budget > 0")
    // The scratch weight column is appended then dropped positionally at the
    // emit step; a pre-existing column of the same name would be silently
    // clobbered by withColumn and the WRONG column dropped.
    require(!df.columns.contains("_pk_w"),
      "input already has a column named _pk_w (reserved scratch name)")
    Seq(cumCol, shardCol).foreach(c => require(!df.columns.contains(c),
      s"output column $c already exists on the input"))
    val spark = df.sparkSession
    val ordCols = order.map(col)
    val sorted = df
      .withColumn("_pk_w", col(weightCol).cast(LongType))
      .repartitionByRange(ordCols: _*)
      .sortWithinPartitions(ordCols.map(_.asc): _*)

    // One physical plan → one RDD → one set of range boundaries; both jobs
    // below reuse its shuffle files (see GlobalIndex for the pattern).
    val rdd = sorted.rdd
    val wIdx = sorted.schema.fieldIndex("_pk_w")
    val partTotals = rdd
      .mapPartitions(it => Iterator.single(it.foldLeft(0L)((a, r) => a + r.getLong(wIdx))),
        preservesPartitioning = true)
      .collect()
    val offsets = partTotals.scanLeft(0L)(_ + _)

    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      it.map { r =>
        cum += r.getLong(wIdx)
        Row.fromSeq(r.toSeq.dropRight(1) :+ cum :+ (cum - 1) / budget)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.dropRight(1))
      .add(cumCol, LongType, nullable = false)
      .add(shardCol, LongType, nullable = false)
    spark.createDataFrame(out, schema)
  }
}
