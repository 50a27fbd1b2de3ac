package graft.sinks

/** PostgreSQL `COPY FROM STDIN` loader — the reference's actual load
  * mechanism (wrds2pg/postgres/copy.py:57-247 streams a gzipped CSV pipe
  * into COPY).
  *
  * graft's equivalent streams each part file of a [[CsvSink]] directory
  * through one `psql \copy` process. Parts load sequentially here; the scale
  * story is per-part concurrency (COPY parallelizes across connections), and
  * the fully-distributed alternative is [[JdbcSink.load]] — executors write
  * batched inserts directly. CSV conventions match CsvSink: header row,
  * empty string = NULL, standard quoting.
  */
object PgCopy {

  /** Executes one SQL statement via psql; throws with stderr on failure. */
  def runSql(psqlBase: Seq[String], sql: String): Unit = {
    val proc = new ProcessBuilder(
      (psqlBase ++ Seq("-v", "ON_ERROR_STOP=1", "-q", "-c", sql)): _*).start()
    proc.getOutputStream.close()
    val stderr = new String(proc.getErrorStream.readAllBytes(), "UTF-8").trim
    require(proc.waitFor() == 0, s"psql failed for [$sql]: $stderr")
  }

  /** One-row query via psql -tA; returns trimmed stdout. */
  def querySql(psqlBase: Seq[String], sql: String): String = {
    val proc = new ProcessBuilder(
      (psqlBase ++ Seq("-v", "ON_ERROR_STOP=1", "-tA", "-c", sql)): _*).start()
    proc.getOutputStream.close()
    val stdout = new String(proc.getInputStream.readAllBytes(), "UTF-8").trim
    val stderr = new String(proc.getErrorStream.readAllBytes(), "UTF-8").trim
    require(proc.waitFor() == 0, s"psql failed for [$sql]: $stderr")
    stdout
  }

  /** The table's comment stamp, or None when the table or comment is absent
    * (to_regclass avoids erroring on a missing table). */
  def tableComment(psqlBase: Seq[String], schema: String, table: String): Option[String] = {
    val out = querySql(psqlBase,
      s"""SELECT coalesce(obj_description(to_regclass('"$schema"."$table"')), '')""")
    if (out.isEmpty) None else Some(out)
  }

  /** Loads every CSV part file under `dir` into the (pre-created) table.
    *
    * Each part's session is pinned the way the reference pins its COPY
    * connection (copy.py:12,43-44): `DateStyle 'ISO, MDY'` and
    * `TimeZone '<tz>'` are SET before the COPY, so timestamptz parsing never
    * inherits a server-local default, and the COPY declares `ENCODING`.
    *
    * @param psqlBase psql invocation prefix, e.g.
    *                 `Seq("psql", "-h", sockDir, "-U", user, "dbname")`
    * @param tz       session TimeZone for the load (reference `tz="UTC"`)
    * @param copyEncoding encoding declared on the COPY itself
    * @return total rows copied (summed from psql's `COPY n` tags) */
  def loadCsvDir(
      dir: String, schema: String, table: String,
      psqlBase: Seq[String], header: Boolean = true,
      tz: String = "UTC", copyEncoding: String = "UTF8"): Long = {
    val parts = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".csv.gz") || f.getName.endsWith(".csv"))
      .sortBy(_.getName)
    parts.map { f =>
      val headerOpt = if (header) ", HEADER" else ""
      val cmd = psqlBase ++ Seq("-v", "ON_ERROR_STOP=1", "-tA",
        "-c", "SET DateStyle TO 'ISO, MDY'",
        "-c", s"SET TimeZone TO '${tz.replace("'", "''")}'",
        "-c",
        s"""\\copy "$schema"."$table" FROM pstdin WITH (FORMAT csv$headerOpt, ENCODING '$copyEncoding')""")
      val proc = new ProcessBuilder(cmd: _*).start()
      val in: java.io.InputStream =
        if (f.getName.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
        else new java.io.FileInputStream(f)
      val out = proc.getOutputStream
      try in.transferTo(out) finally { in.close(); out.close() }
      val stdout = new String(proc.getInputStream.readAllBytes(), "UTF-8").trim
      val stderr = new String(proc.getErrorStream.readAllBytes(), "UTF-8").trim
      require(proc.waitFor() == 0, s"psql COPY failed for ${f.getName}: $stderr")
      stdout.linesIterator.toSeq.lastOption match {
        case Some(s"COPY $n") => n.trim.toLong
        case _ => 0L
      }
    }.sum
  }
}
