package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics without a table format: fold a changeset into a
  * snapshot, latest version per key wins — the incremental-refresh verb a
  * warehouse runs between full rebuilds (the reference rebuilds whole
  * tables per update, wrds2pg/api.py:37 `wrds_update`; at 100 TB you merge
  * the delta instead).
  *
  * Shape: union (no shuffle) → ONE partial-aggregatable struct-max
  * hash aggregate keyed on `keyCols` (the q55 argmax pattern — version
  * comparison combines map-side, so hot keys reduce before the shuffle
  * and there is no per-key window sort). Deletes are soft: a changeset
  * row with `tombstoneCol = true` wins its key and is then dropped.
  *
  * Determinism: ties on `versionCol` resolve by the remaining struct
  * fields (document a strictly increasing version to avoid relying on
  * that). Keys present only in the snapshot pass through; keys only in
  * the changeset insert.
  */
object Merge {

  /** Merge `changes` into `snapshot` (identical schemas): per key, the row
    * with the highest `versionCol` survives; rows whose winning version
    * has `tombstoneCol = true` (when set) are deleted from the result. */
  def upsert(
      snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, tombstoneCol: Option[String] = None): DataFrame = {
    require(snapshot.columns.sameElements(changes.columns),
      "snapshot and changeset schemas must match")
    val dataCols = snapshot.columns.filterNot(keyCols.contains).toSeq
    val ordered = versionCol +: dataCols.filterNot(_ == versionCol)
    val merged = snapshot.unionByName(changes)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_m"))
      .select(keyCols.map(col) ++ dataCols.map(c => col(s"_m.$c").as(c)): _*)
    tombstoneCol match {
      case Some(t) => merged.where(!coalesce(col(t), lit(false))).drop(t)
      case None => merged
    }
  }
}
