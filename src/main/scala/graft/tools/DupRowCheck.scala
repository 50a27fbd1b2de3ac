package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Registry-wide duplicated-row sweep — the third robustness sibling
  * (EmptyInputCheck, NullInputCheck): copy every table with ~5% of rows
  * DUPLICATED whole (re-ingested crawl rows, replayed batches, an
  * upstream job run twice — all routine at 100 TB), then run each query
  * TWICE. The gate is threefold: no crash, both runs produce the SAME
  * canonical fingerprint (duplicate rows must not turn tie-breaks
  * nondeterministic), and loud refusals stay loud. Outputs legitimately
  * differ from the clean-data oracle (counts change), so no value
  * compare — determinism under duplication is the invariant.
  */
object DupRowCheck {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def render(v: Any): String = v match {
    case null => " "
    case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
    case a: Array[_] => a.map(render).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => render(k) + "=" + render(x) }
        .sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => render(r.toSeq)
    case d: Double => java.lang.Double.toHexString(d)
    case f: Float => java.lang.Float.toHexString(f)
    case other => String.valueOf(other)
  }

  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val lines = df.select(cols.map(col): _*).collect().map(render).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map(b => f"$b%02x").mkString
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_dups").toString
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      // duplicate a deterministic ~5% of rows, whole
      val dup = df.where(pmod(xxhash64(struct(df.columns.map(col): _*)), lit(20)) === 0)
      df.unionByName(dup).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val outcome =
        try {
          val h1 = fingerprint(fn(spark, dir))
          spark.catalog.clearCache()
          val h2 = fingerprint(fn(spark, dir))
          if (h1 == h2) "ok"
          else { bad += 1; s"NONDETERMINISTIC under duplicated rows ($h1 vs $h2)" }
        } catch {
          case e: IllegalArgumentException => s"REQUIRE: ${first(e)}"
          case e: Throwable =>
            val root = rootCause(e)
            if (root.isInstanceOf[IllegalArgumentException] ||
              e.getClass.getName.contains("SparkRuntimeException") &&
                String.valueOf(e.getMessage).contains("USER_RAISED_EXCEPTION"))
              s"REQUIRE: ${first(root)}"
            else { bad += 1; s"CRASH: ${root.getClass.getSimpleName}: ${first(root)}" }
        }
      println(s"[dups] $name $outcome")
      spark.catalog.clearCache()
    }
    println(s"[dups] done, $bad findings")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }

  private def rootCause(e: Throwable): Throwable =
    if (e.getCause == null || e.getCause == e) e else rootCause(e.getCause)

  private def first(e: Throwable): String =
    String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)
}
