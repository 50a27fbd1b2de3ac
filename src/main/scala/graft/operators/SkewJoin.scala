package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy-hitter keys.
  *
  * The probe (large, skewed) side gets a deterministic salt in
  * [0, buckets); the build side is replicated once per salt value; the join
  * key becomes (key, salt). A key that would land on one reducer spreads
  * across `buckets` of them. Results are identical to the unsalted join.
  *
  * Scale notes (SURVEY §4): AQE's runtime skew-join splitting is the first
  * line of defense and needs no plan change; explicit salting is for the
  * cases AQE can't fix — skew inside a single key within an aggregation
  * feeding the join, or a build side too large for broadcast but small
  * enough to replicate `buckets`×. The salt is derived from a caller-chosen
  * column (deterministic, repeatable runs), not rand().
  */
object SkewJoin {

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      buckets: Int,
      saltBy: Column,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = probe.withColumn("_salt", pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val replicated = build.withColumn("_salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop("_salt")
  }
}
