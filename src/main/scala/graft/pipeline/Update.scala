package graft.pipeline

import graft.sinks.{CsvSink, ParquetSink}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}
import java.time.{LocalDateTime, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** Incremental-update orchestration — the reference's `wrds_update_pq` /
  * `wrds_update_csv` control flow (wrds2pg/api.py:238-432, 434-584):
  * read the source's "Last modified" stamp, compare with the stamp stored on
  * the local artifact, skip when equal unless forced, else rebuild + restamp.
  *
  * The stamp math matches the reference bit-for-bit: WRDS stamps are wall
  * clock America/Chicago; encode converts to a UTC epoch and back
  * (wrds2pg/files/csv.py:12-43).
  */
object Update {

  private val WrdsZone = ZoneId.of("America/Chicago")
  private val Fmt = DateTimeFormatter.ofPattern("MM/dd/yyyy HH:mm:ss")
  private val Prefix = "Last modified: "

  /** "Last modified: MM/dd/yyyy HH:mm:ss" (America/Chicago) → epoch seconds. */
  def modifiedEncode(lastModified: String): Double = {
    require(lastModified.startsWith(Prefix), s"Unexpected modified string: $lastModified")
    val dt = LocalDateTime.parse(lastModified.stripPrefix(Prefix), Fmt)
    dt.atZone(WrdsZone).toInstant.getEpochSecond.toDouble
  }

  /** epoch seconds → "Last modified: ..." in America/Chicago. */
  def modifiedDecode(epochSeconds: Double): String = {
    val zdt = ZonedDateTime.ofInstant(java.time.Instant.ofEpochSecond(epochSeconds.toLong), WrdsZone)
    Prefix + zdt.format(Fmt)
  }

  sealed trait Outcome
  case object UpToDate extends Outcome
  case object Updated extends Outcome
  case object Forced extends Outcome

  /** Rebuild `pqPath` from `source` unless its stamp already equals `modified`.
    * `source` is by-name: when up to date, no plan is even constructed —
    * the skip costs one sidecar read, never a 100 TB scan. */
  def updateParquet(
      spark: SparkSession,
      source: => DataFrame,
      pqPath: String,
      modified: String,
      force: Boolean = false
  ): Outcome = {
    val existing = ParquetSink.getModified(spark, pqPath)
    if (existing == modified && !force) UpToDate
    else {
      ParquetSink.write(source, pqPath, modified)
      if (force && existing == modified) Forced else Updated
    }
  }

  /** The stamp a CSV artifact carries, or None if it doesn't exist yet. Like
    * the reference (wrds2pg/files/csv.py:45-83), the stamp is encoded in the
    * artifact's mtime — here the output directory's, since graft writes a
    * parallel directory of gzipped parts rather than one stream. */
  def csvModified(csvPath: String): Option[String] = {
    val p = Paths.get(csvPath)
    if (Files.exists(p)) Some(modifiedDecode(Files.getLastModifiedTime(p).toMillis / 1000.0))
    else None
  }

  /** Rebuild the gzipped-CSV artifact unless its mtime-encoded stamp already
    * equals `modified` (`wrds_update_csv` semantics, skip/force included). */
  def updateCsv(
      spark: SparkSession,
      source: => DataFrame,
      csvPath: String,
      modified: String,
      force: Boolean = false
  ): Outcome = {
    val existing = csvModified(csvPath)
    if (existing.contains(modified) && !force) UpToDate
    else {
      CsvSink.write(source, csvPath)
      Files.setLastModifiedTime(
        Paths.get(csvPath), FileTime.fromMillis((modifiedEncode(modified) * 1000).toLong))
      if (force && existing.contains(modified)) Forced else Updated
    }
  }
}
