package graft.pipeline

import graft.sinks.{CsvSink, JdbcSink, PgCopy}
import org.apache.spark.sql.DataFrame

/** The reference's headline verb end-to-end: `wrds_update` into PostgreSQL
  * (wrds2pg/wrds2pg.py:553 wrds_update → wrds_to_pg).
  *
  * Control flow matches the reference exactly: read the stamp stored as the
  * PG table's comment (`obj_description`), skip when it equals the source's
  * "Last modified" stamp unless forced, else schema/roles/drop/create DDL →
  * COPY FROM STDIN load → grants → restamp the comment. `source` is by-name
  * so a skip never constructs the (potentially 100 TB) plan.
  *
  * Integration-tested against a real throwaway PostgreSQL cluster in IoSpec
  * (update → skip → force cycle).
  */
object UpdatePg {

  /** @param psqlBase psql invocation prefix for the driver-side control
    *                 statements and COPY streams
    * @param stagingDir where the gzipped-CSV part files are staged */
  def updateCopy(
      source: => DataFrame,
      target: JdbcSink.PgTarget,
      modified: String,
      psqlBase: Seq[String],
      stagingDir: String,
      force: Boolean = false): Update.Outcome = {
    import graft.sinks.PgDdl
    val existing = PgCopy.tableComment(psqlBase, target.schema, target.table)
    if (!force && existing.contains(modified)) Update.UpToDate
    else {
      val df = source
      // schema/roles pre-exist on a refresh — tolerated, like the reference
      Seq(PgDdl.createSchemaSql(target.schema),
        PgDdl.createRoleSql(target.schema),
        PgDdl.createRoleSql(s"${target.schema}_access"))
        .foreach { sql =>
          try PgCopy.runSql(psqlBase, sql)
          catch { case _: IllegalArgumentException => () }
        }
      PgCopy.runSql(psqlBase, PgDdl.dropTableSql(target.schema, target.table))
      PgCopy.runSql(psqlBase, PgDdl.createTableSql(target.schema, target.table, df.schema))
      CsvSink.write(df, stagingDir)
      PgCopy.loadCsvDir(stagingDir, target.schema, target.table, psqlBase)
      JdbcSink.postloadStatements(target, modified).foreach(PgCopy.runSql(psqlBase, _))
      if (force && existing.contains(modified)) Update.Forced else Update.Updated
    }
  }
}
