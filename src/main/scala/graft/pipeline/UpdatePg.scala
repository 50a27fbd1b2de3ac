package graft.pipeline

import graft.sinks.{CsvSink, JdbcSink, PgCopy}
import org.apache.spark.sql.DataFrame

/** The reference's headline verb end-to-end: `wrds_update` into PostgreSQL
  * (wrds2pg/api.py:37 wrds_update → wrds_to_pg).
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
    * @param stagingDir where the gzipped-CSV part files are staged
    * @param createRoles mirror of the reference's `create_roles` — when
    *                 false, no owner/access roles are created and no grants
    *                 are issued (api.py:48 `create_roles=True` default)
    * @param tz      COPY-session TimeZone (reference `tz="UTC"`) */
  def updateCopy(
      source: => DataFrame,
      target: JdbcSink.PgTarget,
      modified: String,
      psqlBase: Seq[String],
      stagingDir: String,
      force: Boolean = false,
      createRoles: Boolean = true,
      tz: String = "UTC"): Update.Outcome = {
    import graft.sinks.PgDdl
    val existing = PgCopy.tableComment(psqlBase, target.schema, target.table)
    if (!force && existing.contains(modified)) Update.UpToDate
    else {
      val df = source
      // schema/roles pre-exist on a refresh — tolerated, like the reference
      (Seq(PgDdl.createSchemaSql(target.schema)) ++
        (if (createRoles) Seq(PgDdl.createRoleSql(target.schema),
          PgDdl.createRoleSql(s"${target.schema}_access")) else Nil))
        .foreach { sql =>
          try PgCopy.runSql(psqlBase, sql)
          catch { case _: IllegalArgumentException => () }
        }
      PgCopy.runSql(psqlBase, PgDdl.dropTableSql(target.schema, target.table))
      PgCopy.runSql(psqlBase, PgDdl.createTableSql(target.schema, target.table, df.schema))
      CsvSink.write(df, stagingDir)
      PgCopy.loadCsvDir(stagingDir, target.schema, target.table, psqlBase, tz = tz)
      JdbcSink.postloadStatements(target, modified, createRoles)
        .foreach(PgCopy.runSql(psqlBase, _))
      if (force && existing.contains(modified)) Update.Forced else Update.Updated
    }
  }
}
