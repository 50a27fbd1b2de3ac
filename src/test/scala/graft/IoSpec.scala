package graft

import graft.pipeline.Update
import graft.sinks.{CsvSink, ParquetSink, PgDdl}
import graft.sources.{Catalog, SasCsvReader, SasTypes}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("SasCsvReader: fix_missing turns SAS special missings into NULL, fix_cr strips CRs") {
    val dir = tmp("csv")
    val csv = s"$dir/in.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "id,val,note\n1,1.5,ok\n2,.,dot\n3,.A,special\n4,B,bare\n5,,empty\n6,2.5,\"li\rne\"\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("val", DoubleType), StructField("note", StringType)))

    val out = SasCsvReader.read(spark, csv, schema, fixMissing = true, fixCr = true)
      .orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ==
      Seq(1.5, null, null, null, null, 2.5))
    assert(out(5).getString(2) == "line")

    // without fixMissing, only "." and "" are missing; ".A"/"B" fail the cast → null anyway,
    // mirroring COPY-side behavior being stricter than parquet-side
    val out2 = SasCsvReader.read(spark, csv, schema, fixMissing = false, fixCr = true)
      .orderBy("id").collect()
    assert(out2.count(_.isNullAt(1)) == 4)
  }

  test("SasCsvReader: encoding option reads latin1 exports (reference encoding/sas_encoding)") {
    val dir = tmp("latin1")
    val csv = s"$dir/in.csv"
    // genuine ISO-8859-1 bytes: é = 0xE9, ü = 0xFC — invalid as UTF-8
    val body = "id,comnam\n1,SOCIÉTÉ GÉNÉRALE\n2,MÜNCHENER RÜCK\n"
    Files.write(java.nio.file.Paths.get(csv),
      body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("comnam", StringType)))
    val good = SasCsvReader.read(spark, csv, schema, encoding = "ISO-8859-1")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(good == Seq("SOCIÉTÉ GÉNÉRALE", "MÜNCHENER RÜCK"))
    // the UTF-8 default cannot round-trip those bytes — this is the mis-read
    // the encoding parameter exists to fix
    val bad = SasCsvReader.read(spark, csv, schema)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(bad != good)
  }

  test("CsvSink → SasCsvReader roundtrip preserves typed values") {
    val s = spark
    import s.implicits._
    val dir = tmp("roundtrip") + "/out"
    val df = Seq((1L, 10.5, "a"), (2L, -0.25, null.asInstanceOf[String])).toDF("k", "v", "s")
    CsvSink.write(df, dir)
    val back = SasCsvReader.read(spark, dir, df.schema).orderBy("k").collect()
    assert(back(0).getDouble(1) == 10.5 && back(1).getDouble(1) == -0.25)
    assert(back(1).isNullAt(2))
  }

  test("ParquetSink last_modified stamp roundtrip + Update skip/force") {
    val s = spark
    import s.implicits._
    val dir = tmp("pq") + "/t"
    val stamp = "Last modified: 03/01/2024 10:00:00"
    var builds = 0
    def src = { builds += 1; Seq((1, "x")).toDF("a", "b") }

    assert(ParquetSink.getModified(spark, dir) == "")
    assert(Update.updateParquet(spark, src, dir, stamp) == Update.Updated)
    assert(builds == 1)
    assert(ParquetSink.getModified(spark, dir) == stamp)
    // up-to-date: source must not even be constructed
    assert(Update.updateParquet(spark, src, dir, stamp) == Update.UpToDate)
    assert(builds == 1)
    assert(Update.updateParquet(spark, src, dir, stamp, force = true) == Update.Forced)
    assert(builds == 2)
    // new stamp → rebuild
    assert(Update.updateParquet(spark, src, dir, "Last modified: 03/02/2024 10:00:00") == Update.Updated)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("stamp lives in the TRUE footer KV of every part file; data and spark schema survive") {
    val s = spark
    import s.implicits._
    val dir = tmp("pqkv") + "/t"
    val stamp = "Last modified: 05/06/2024 11:22:33"
    val df = (1 to 100).map(i => (i.toLong, s"row $i")).toDF("a", "b").repartition(3)
    ParquetSink.write(df, dir, stamp)
    // every part file's FOOTER carries the key the reference reads
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(parts.length >= 2, "want multiple part files for the per-file claim")
    parts.foreach { f =>
      assert(graft.sinks.ParquetKvStamp.readKeyValue(spark, f, "last_modified") == stamp, f)
    }
    // the raw row-group copy preserved the data AND Spark's own schema entry
    val back = spark.read.parquet(dir)
    assert(back.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      (1 to 100).map(i => (i.toLong, s"row $i")))
    // footer read wins even with a lying sidecar (the reference surface rules)
    ParquetSink.setModified(spark, dir, stamp) // idempotent re-stamp
    assert(ParquetSink.getModified(spark, dir) == stamp)
  }

  test("writePartitioned: hive layout, partition pruning reaches the scan") {
    val dir = tmp("part") + "/t"
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    ParquetSink.writePartitioned(docs, dir, Seq("lang"), "Last modified: 01/01/2024 00:00:00")
    assert(ParquetSink.getModified(spark, dir) == "Last modified: 01/01/2024 00:00:00")
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val one = back.where(org.apache.spark.sql.functions.col("lang") === "en")
    // partition filter must prune directories, not scan+filter rows
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
    assert(one.count() == docs.where(org.apache.spark.sql.functions.col("lang") === "en").count())
  }

  test("updateCsv: mtime-encoded stamp drives skip/rebuild/force") {
    val s = spark
    import s.implicits._
    val dir = tmp("csvup") + "/t"
    val stamp = "Last modified: 03/01/2024 10:00:00"
    var builds = 0
    def src = { builds += 1; Seq((1, "x")).toDF("a", "b") }

    assert(Update.csvModified(dir).isEmpty)
    assert(Update.updateCsv(spark, src, dir, stamp) == Update.Updated)
    assert(builds == 1)
    assert(Update.csvModified(dir).contains(stamp))
    assert(Update.updateCsv(spark, src, dir, stamp) == Update.UpToDate)
    assert(builds == 1)
    assert(Update.updateCsv(spark, src, dir, stamp, force = true) == Update.Forced)
    assert(builds == 2)
    assert(Update.updateCsv(spark, src, dir, "Last modified: 03/02/2024 10:00:00") == Update.Updated)
    assert(SasCsvReader.read(spark, dir,
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))).count() == 1)
  }

  test("modified stamp encode/decode matches reference semantics (America/Chicago)") {
    // 2024-03-01 10:00:00 America/Chicago is CST (UTC-6) → 16:00 UTC
    val stamp = "Last modified: 03/01/2024 10:00:00"
    val epoch = Update.modifiedEncode(stamp)
    assert(epoch == java.time.Instant.parse("2024-03-01T16:00:00Z").getEpochSecond.toDouble)
    assert(Update.modifiedDecode(epoch) == stamp)
    // DST: July is CDT (UTC-5)
    val july = Update.modifiedEncode("Last modified: 07/01/2024 10:00:00")
    assert(july == java.time.Instant.parse("2024-07-01T15:00:00Z").getEpochSecond.toDouble)
  }

  test("PgDdl: create/grant/comment SQL mirrors reference strings") {
    val st = StructType(Seq(
      StructField("permno", LongType), StructField("ret", DoubleType),
      StructField("date", DateType), StructField("comnam", StringType)))
    assert(PgDdl.createTableSql("crsp", "dsf", st) ==
      """CREATE TABLE "crsp"."dsf" ("permno" bigint, "ret" float8, "date" date, "comnam" text)""")
    assert(PgDdl.grantSql("crsp", "dsf") == Seq(
      """ALTER TABLE "crsp"."dsf" OWNER TO "crsp"""",
      """GRANT SELECT ON "crsp"."dsf" TO "crsp_access""""))
    assert(PgDdl.setCommentSql("crsp", "dsf", "it's new") ==
      """COMMENT ON TABLE "crsp"."dsf" IS 'it''s new'""")
    assert(PgDdl.splitStatements("a;\n b ; ;c") == Seq("a", "b", "c"))
  }

  test("JdbcSink statements mirror the reference's load order") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x")).toDF("permno", "comnam")
    val t = graft.sinks.JdbcSink.PgTarget("jdbc:postgresql://h/db", "u", "p", "crsp", "dsf")
    val pre = graft.sinks.JdbcSink.preloadStatements(df, t)
    assert(pre === Seq(
      """CREATE SCHEMA "crsp"""",
      """CREATE ROLE "crsp"""",
      """CREATE ROLE "crsp_access"""",
      """DROP TABLE IF EXISTS "crsp"."dsf" CASCADE""",
      """CREATE TABLE "crsp"."dsf" ("permno" bigint, "comnam" text)"""))
    val post = graft.sinks.JdbcSink.postloadStatements(t, "Last modified: 01/01/2024 00:00:00")
    assert(post.last === """COMMENT ON TABLE "crsp"."dsf" IS 'Last modified: 01/01/2024 00:00:00'""")
  }

  test("JdbcSink.load round-trips through embedded Derby") {
    val s = spark
    import s.implicits._
    // Derby's embedded engine ships on Spark's classpath (metastore dep) —
    // the closest thing to a live server this environment allows, so the
    // actual distributed write path (driver class, props, batched append)
    // runs for real; the PG-specific DDL strings stay unit-tested above.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE SCHEMA "wrds"""")
      st.execute(
        """CREATE TABLE "wrds"."dsf" ("permno" BIGINT, "comnam" VARCHAR(64), "prc" DOUBLE)""")
      st.close()
    } finally conn.close()
    val df = Seq((10001L, "ACME", 1.25), (10002L, "BETA", 2.5)).toDF("permno", "comnam", "prc")
    graft.sinks.JdbcSink.load(
      df, graft.sinks.JdbcSink.PgTarget(url, "app", "", "wrds", "dsf"), driver = driver)
    val back = s.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", """"wrds"."dsf"""").load()
    assert(back.orderBy("permno").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((10001L, "ACME", 1.25), (10002L, "BETA", 2.5)))
  }

  test("Graft.runSqlFile executes a multi-statement .sql body in order (Derby)") {
    val url = "jdbc:derby:memory:runsqldb;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // statement-terminator noise the splitter must survive: trailing
      // semicolon, blank statements, internal newlines
      val body =
        """CREATE TABLE t_rsf (id INT, name VARCHAR(16));
          |
          |INSERT INTO t_rsf VALUES (1, 'a');
          |INSERT INTO t_rsf
          |  VALUES (2, 'b');
          |""".stripMargin
      assert(graft.Graft.runSqlFile(conn, body) == 3)
      val rs = conn.createStatement()
        .executeQuery("SELECT id, name FROM t_rsf ORDER BY id")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getString(2))).toSeq
      assert(got == Seq(1 -> "a", 2 -> "b"))
      // a failing statement propagates; prior statements stay applied
      intercept[java.sql.SQLException] {
        graft.Graft.runSqlFile(conn,
          "INSERT INTO t_rsf VALUES (3, 'c'); INSERT INTO nope VALUES (1)")
      }
      val rs2 = conn.createStatement().executeQuery("SELECT count(*) FROM t_rsf")
      rs2.next()
      assert(rs2.getInt(1) == 3)
    } finally conn.close()
  }

  test("updateJdbc runs the full create/load/stamp/skip/force cycle (Derby)") {
    val s = spark
    import s.implicits._
    import graft.pipeline.{Update, UpdateJdbc}
    // PG's comment/role vocabulary doesn't exist in Derby, so the spec
    // supplies a side-table stamp dialect; the CONTROL FLOW under test
    // (stamp-read → skip/force → tolerated+strict DDL → distributed load →
    // postload restamp) is exactly the production path.
    val url = "jdbc:derby:memory:ujdb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val stamps = """"uj"."graft_stamps""""
    val derby = UpdateJdbc.Dialect(
      tolerated = (_, t) => Seq(
        s"""CREATE SCHEMA "${t.schema}"""",
        s"""CREATE TABLE $stamps ("tbl" VARCHAR(128), "stamp" VARCHAR(256))""",
        s"""DROP TABLE "${t.schema}"."${t.table}""""), // Derby has no IF EXISTS
      strict = (df, t) => {
        val cols = df.schema.fields.map { f =>
          val ty = f.dataType match {
            case org.apache.spark.sql.types.LongType => "BIGINT"
            case org.apache.spark.sql.types.DoubleType => "DOUBLE"
            case _ => "VARCHAR(256)"
          }
          s""""${f.name}" $ty"""
        }.mkString(", ")
        Seq(s"""CREATE TABLE "${t.schema}"."${t.table}" ($cols)""")
      },
      postload = (t, m) => Seq(
        s"""DELETE FROM $stamps WHERE "tbl" = '${t.table}'""",
        s"""INSERT INTO $stamps VALUES ('${t.table}', '$m')"""),
      readStamp = (conn, t) => {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            s"""SELECT "stamp" FROM $stamps WHERE "tbl" = '${t.table}'""")
          if (rs.next()) Option(rs.getString(1)) else None
        } finally st.close()
      },
      driver = driver)

    val t = graft.sinks.JdbcSink.PgTarget(url, "", "", "uj", "prices")
    val stamp = "Last modified: 02/03/2024 04:05:06"
    var built = 0
    def src = { built += 1; Seq((1L, 10.0), (2L, 20.0)).toDF("permno", "ret") }

    // fresh target: stamp surface doesn't exist yet → readStamp throws → None
    assert(UpdateJdbc.update(src, t, stamp, dialect = derby) == Update.Updated)
    assert(built == 1)
    Class.forName(driver)
    def q(sql: String): Seq[String] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(sql)
        val out = scala.collection.mutable.ArrayBuffer[String]()
        while (rs.next()) out += rs.getString(1)
        out.toSeq
      } finally c.close()
    }
    assert(q("""SELECT CAST(count(*) AS CHAR(8)) FROM "uj"."prices"""").head.trim == "2")
    assert(q(s"""SELECT "stamp" FROM $stamps WHERE "tbl" = 'prices'""") == Seq(stamp))
    // same stamp → skip without even constructing the source plan
    assert(UpdateJdbc.update(src, t, stamp, dialect = derby) == Update.UpToDate)
    assert(built == 1, "a stamp-skip must not build the source plan")
    // force → drop/recreate/reload under the same stamp
    assert(UpdateJdbc.update(src, t, stamp, force = true, dialect = derby) == Update.Forced)
    assert(built == 2)
    assert(q("""SELECT CAST(count(*) AS CHAR(8)) FROM "uj"."prices"""").head.trim == "2")
    // new stamp → refresh
    assert(UpdateJdbc.update(src, t, stamp.replace("2024", "2025"), dialect = derby) == Update.Updated)
    assert(q(s"""SELECT "stamp" FROM $stamps WHERE "tbl" = 'prices'""").head.contains("2025"))
  }

  test("generated PG DDL + CSV COPY load run against a real PostgreSQL") {
    import scala.sys.process._
    val s = spark
    import s.implicits._
    // postgres refuses to run as root: the throwaway cluster runs as
    // 'nobody'. Skipped (assume) wherever the binaries or user are absent.
    val bins = new java.io.File("/usr/local/bin/initdb")
    assume(bins.exists, "no postgres binaries in this environment")
    val root = Files.createTempDirectory("graft-pg").toFile
    val data = s"$root/data"
    val sock = s"$root/sock"
    new java.io.File(sock).mkdirs()
    def su(cmd: String): Int =
      Process(Seq("su", "-s", "/bin/sh", "nobody", "-c", cmd), new java.io.File("/tmp")).!
    assume(Process(Seq("chown", "-R", "nobody", root.toString), new java.io.File("/tmp")).! == 0,
      "cannot chown as this user")
    assume(su(s"/usr/local/bin/initdb -D $data >$root/initdb.log 2>&1") == 0, "initdb failed")
    assume(su(s"/usr/local/bin/pg_ctl -D $data -o '-c listen_addresses= " +
      s"-c unix_socket_directories=$sock' -l $root/pg.log start") == 0, "pg_ctl start failed")
    try {
      val psql = Seq("psql", "-h", sock, "-U", "nobody", "postgres", "-v", "ON_ERROR_STOP=1")
      def run(sql: String): Unit =
        assert(Process(psql ++ Seq("-q", "-c", sql), new java.io.File("/tmp")).! == 0, sql)
      def query(sql: String): String =
        Process(psql ++ Seq("-tA", "-c", sql), new java.io.File("/tmp")).!!.trim

      val df = Seq((10001L, "ACME", 1.25), (10002L, "BE,TA", 2.5), (10003L, null, 0.0))
        .toDF("permno", "comnam", "prc")
      val t = graft.sinks.JdbcSink.PgTarget("", "nobody", "", "crsp", "dsf")
      // the generated DDL (schema, roles, drop-if-exists, create table) must
      // be accepted by a real PostgreSQL, not just string-compared
      graft.sinks.JdbcSink.preloadStatements(df, t).foreach(run)
      val dir = tmp("pgcopy") + "/csv"
      CsvSink.write(df.repartition(2), dir)
      val copied = graft.sinks.PgCopy.loadCsvDir(dir, "crsp", "dsf", psql)
      assert(copied == 3L)
      assert(query("""SELECT count(*) || '|' || coalesce(sum(prc), 0) FROM "crsp"."dsf"""") == "3|3.75")
      assert(query("""SELECT count(*) FROM "crsp"."dsf" WHERE comnam IS NULL""") == "1")
      assert(query("""SELECT comnam FROM "crsp"."dsf" WHERE permno = 10002""") == "BE,TA")
      // post-load: grants to the generated roles + the modified-stamp comment
      graft.sinks.JdbcSink.postloadStatements(t, "Last modified: 01/01/2024").foreach(run)
      assert(query("""SELECT obj_description('"crsp"."dsf"'::regclass)""") == "Last modified: 01/01/2024")

      // COPY session TimeZone: timestamps must load as UTC even when the
      // database default is not (reference copy.py pins TimeZone per load)
      run("""ALTER DATABASE postgres SET timezone TO 'America/New_York'""")
      run("""CREATE TABLE "crsp"."tzt" ("k" integer, "t" timestamptz)""")
      val tzDir = tmp("pgtz")
      Files.writeString(java.nio.file.Paths.get(s"$tzDir/p.csv"),
        "k,t\n1,2024-01-02 03:04:05\n")
      assert(graft.sinks.PgCopy.loadCsvDir(tzDir, "crsp", "tzt", psql) == 1L)
      val epoch = query("""SELECT extract(epoch FROM t)::bigint FROM "crsp"."tzt"""")
      val wantUtc = java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)
        .toEpochSecond(java.time.ZoneOffset.UTC)
      assert(epoch.toLong == wantUtc,
        s"timestamp loaded under server-local zone: epoch $epoch, want $wantUtc")

      // full wrds_update control flow: refresh → stamp-skip → force
      import graft.pipeline.{Update, UpdatePg}
      val t2 = graft.sinks.JdbcSink.PgTarget("", "nobody", "", "crsp", "msf")
      var built = 0
      def src = { built += 1; Seq((1L, 10.0), (2L, 20.0)).toDF("permno", "ret") }
      val stamp = "Last modified: 02/03/2024 04:05:06"
      assert(UpdatePg.updateCopy(src, t2, stamp, psql, tmp("upg1")) == Update.Updated)
      assert(query("""SELECT count(*) FROM "crsp"."msf"""") == "2")
      assert(UpdatePg.updateCopy(src, t2, stamp, psql, tmp("upg2")) == Update.UpToDate)
      assert(built == 1, "a stamp-skip must not even build the source plan")
      assert(UpdatePg.updateCopy(src, t2, stamp, psql, tmp("upg3"), force = true) == Update.Forced)
      assert(query("""SELECT count(*) FROM "crsp"."msf"""") == "2")

      // create_roles=False parity: no roles created, no grants issued
      val t3 = graft.sinks.JdbcSink.PgTarget("", "nobody", "", "noroles", "x")
      assert(UpdatePg.updateCopy(src, t3, stamp, psql, tmp("upg4"),
        createRoles = false) == Update.Updated)
      assert(query("""SELECT count(*) FROM "noroles"."x"""") == "2")
      assert(query(
        "SELECT count(*) FROM pg_roles WHERE rolname IN ('noroles','noroles_access')") == "0")
    } finally su(s"/usr/local/bin/pg_ctl -D $data stop -m immediate")
  }

  test("bucketed tables: co-located join plans with zero shuffle exchanges") {
    val s = spark
    import s.implicits._
    // managed tables land in the session's spark-warehouse (gitignored);
    // dropped in the finally block below
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("k", "name")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_dims_b")
    try {
      // disable broadcast so the join would normally shuffle both sides
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("graft_facts_b").join(s.table("graft_dims_b"), "k")
      val exchanges = joined.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges === 0, "bucketed join must not shuffle either side")
      assert(joined.count() === 1000L)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS graft_facts_b")
      s.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("Catalog.listTables lists parquet tables sorted, ignoring sidecars") {
    assert(Catalog.listTables(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0)).toSeq ==
      Seq("customer", "documents", "embeddings", "events", "lineitem",
        "nation", "orders", "part", "region", "supplier"))
  }

  test("inferSchema drives a typed CSV read end-to-end") {
    val dir = tmp("infer")
    val csv = s"$dir/in.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "PERMNO,PRC,DATE\n10001,1.25,2024-01-02\n10002,.,2024-01-03\n")
    val rows = Seq(
      SasTypes.ContentsRow("PERMNO", 1, "", formatl = 8),
      SasTypes.ContentsRow("PRC", 1, "", formatl = 8, formatd = 2),
      SasTypes.ContentsRow("DATE", 1, "YYMMDD10."))
    val schema = SasTypes.inferSchema(rows)
    val out = SasCsvReader.read(spark, csv, schema).orderBy("permno").collect()
    assert(out(0).getInt(0) == 10001)
    assert(out(0).getDouble(1) == 1.25)
    assert(out(0).getDate(2).toString == "2024-01-02")
    assert(out(1).isNullAt(1))
  }
}
