package graft.pipeline

import graft.sinks.{JdbcSink, PgDdl}
import org.apache.spark.sql.DataFrame

import java.sql.{Connection, DriverManager}

/** Full `wrds_update` over JDBC — the distributed-writer twin of
  * [[UpdatePg]] (reference control flow: wrds2pg/api.py:219-234).
  *
  * Same skip/force contract as every other update verb: read the stamp from
  * the target, skip when it equals `modified` unless forced, else preload
  * DDL → distributed `df.write.jdbc` load (N executors × batched inserts —
  * the scale path when a psql binary isn't available on the driver) →
  * grants → restamp. `source` is by-name, so a skip never constructs the
  * plan.
  *
  * All control statements run on ONE driver-side JDBC connection; only the
  * row load is distributed. The statement vocabulary is pluggable via
  * [[UpdateJdbc.Dialect]] because the stamp/comment/role SQL is
  * PostgreSQL's — the production default [[UpdateJdbc.postgres]] uses
  * `obj_description` comments exactly like the reference, while the Derby
  * integration spec (no PG server in this environment) supplies a
  * side-table dialect to prove the create/load/stamp/skip cycle end-to-end.
  */
object UpdateJdbc {

  /** The per-engine statement surface.
    *
    * @param tolerated  statements allowed to fail (pre-existing schema/roles
    *                   on a refresh — the reference tolerates these too)
    * @param strict     statements that must succeed (drop + create table)
    * @param postload   grants + stamp write, all strict
    * @param readStamp  current stamp on the target, None when absent
    * @param driver     JDBC driver class for both control and load paths */
  final case class Dialect(
      tolerated: (DataFrame, JdbcSink.PgTarget) => Seq[String],
      strict: (DataFrame, JdbcSink.PgTarget) => Seq[String],
      postload: (JdbcSink.PgTarget, String) => Seq[String],
      readStamp: (Connection, JdbcSink.PgTarget) => Option[String],
      driver: String)

  /** The reference's PostgreSQL vocabulary: schema + owner/access roles
    * (tolerated on refresh), drop/create, grants, comment-as-stamp.
    * @param createRoles mirror of the reference's `create_roles` — when
    *                    false, no roles are created and no grants issued */
  def postgres(createRoles: Boolean = true): Dialect = Dialect(
    tolerated = (_, t) => Seq(PgDdl.createSchemaSql(t.schema)) ++
      (if (createRoles) Seq(
        PgDdl.createRoleSql(t.schema),
        PgDdl.createRoleSql(s"${t.schema}_access")) else Nil),
    strict = (df, t) => Seq(
      PgDdl.dropTableSql(t.schema, t.table),
      PgDdl.createTableSql(t.schema, t.table, df.schema)),
    postload = (t, m) => JdbcSink.postloadStatements(t, m, createRoles),
    readStamp = (conn, t) => {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(PgDdl.getCommentSql(t.schema, t.table))
        if (rs.next()) Option(rs.getString(1)) else None
      } finally st.close()
    },
    driver = "org.postgresql.Driver")

  def update(
      source: => DataFrame,
      target: JdbcSink.PgTarget,
      modified: String,
      force: Boolean = false,
      dialect: Dialect = postgres(),
      batchSize: Int = 10000): Update.Outcome = {
    Class.forName(dialect.driver)
    val props = new java.util.Properties()
    if (target.user.nonEmpty) props.setProperty("user", target.user)
    if (target.password.nonEmpty) props.setProperty("password", target.password)
    val conn = DriverManager.getConnection(target.url, props)
    try {
      val existing =
        try dialect.readStamp(conn, target)
        catch { case _: java.sql.SQLException => None } // fresh target: no stamp surface yet
      if (!force && existing.contains(modified)) Update.UpToDate
      else {
        val df = source
        dialect.tolerated(df, target).foreach { sql =>
          try exec(conn, sql) catch { case _: java.sql.SQLException => () }
        }
        dialect.strict(df, target).foreach(exec(conn, _))
        JdbcSink.load(df, target, batchSize = batchSize, driver = dialect.driver)
        dialect.postload(target, modified).foreach(exec(conn, _))
        if (force && existing.contains(modified)) Update.Forced else Update.Updated
      }
    } finally conn.close()
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }
}
