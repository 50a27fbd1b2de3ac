package graft.sinks

import org.apache.spark.sql.types._

/** PostgreSQL DDL / role / grant / comment SQL generation — the reference's
  * administrative surface (wrds2pg/postgres/ddl.py, api.py:219-234),
  * re-expressed over Spark schemas.
  *
  * There is no live PostgreSQL server in this environment, so these are
  * generated + spec-tested strings consumed by [[JdbcSink]]; semantics mirror
  * the reference exactly (quoted identifiers, `schema` owner role +
  * `schema_access` read role, comment-as-modified-stamp).
  */
object PgDdl {

  /** Spark DataType → PostgreSQL type name (inverse of SasTypes.sparkType,
    * same vocabulary as the reference's Arrow map, parquet.py:12-26). */
  def pgTypeName(dt: DataType): String = dt match {
    case StringType => "text"
    case IntegerType | ShortType | ByteType => "integer"
    case LongType => "bigint"
    case DoubleType | FloatType => "float8"
    case _: DecimalType => "numeric"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case BooleanType => "boolean"
    case BinaryType => "bytea"
    case other => throw new IllegalArgumentException(s"no PostgreSQL mapping for $other")
  }

  /** CREATE TABLE from names + type names (ddl.py:57-59). */
  def createTableSql(schema: String, table: String, names: Seq[String], colTypes: Map[String, String]): String = {
    val cols = names.map(n => s""""$n" ${colTypes(n)}""").mkString(", ")
    s"""CREATE TABLE "$schema"."$table" ($cols)"""
  }

  /** CREATE TABLE straight from a Spark schema. */
  def createTableSql(schema: String, table: String, st: StructType): String =
    createTableSql(schema, table, st.fields.map(_.name.toLowerCase).toSeq,
      st.fields.map(f => f.name.toLowerCase -> pgTypeName(f.dataType)).toMap)

  def dropTableSql(schema: String, table: String): String =
    s"""DROP TABLE IF EXISTS "$schema"."$table" CASCADE"""

  def createSchemaSql(schema: String): String = s"""CREATE SCHEMA "$schema""""

  def createRoleSql(role: String): String = s"""CREATE ROLE "$role""""

  def roleExistsSql(role: String): String =
    s"SELECT 1 FROM pg_roles WHERE rolname = '${role.replace("'", "''")}' LIMIT 1"

  /** Ownership + access grants for a freshly loaded table (api.py:219-234). */
  def grantSql(schema: String, table: String): Seq[String] = Seq(
    s"""ALTER TABLE "$schema"."$table" OWNER TO "$schema"""",
    s"""GRANT SELECT ON "$schema"."$table" TO "${schema}_access""""
  )

  /** Modified-stamp as table comment (ddl.py:26-38). */
  def setCommentSql(schema: String, table: String, comment: String): String =
    s"""COMMENT ON TABLE "$schema"."$table" IS '${comment.replace("'", "''")}'"""

  def getCommentSql(schema: String, table: String): String =
    s"SELECT obj_description(to_regclass(quote_ident('$schema') || '.' || quote_ident('$table')), 'pg_class')"

  /** Split a .sql file body into statements (run_file_sql, api.py:618-627). */
  def splitStatements(sql: String): Seq[String] =
    sql.split(";").iterator.map(_.trim).filter(_.nonEmpty).toSeq
}
