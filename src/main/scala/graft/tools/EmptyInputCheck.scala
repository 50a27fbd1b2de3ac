package graft.tools

/** Registry-wide empty-input sweep: copy every test table as a 0-row
  * parquet with the identical schema, then run each `SparkEntry.queries`
  * entry against the empty scale dir. At 100 TB, empty inputs are not an
  * edge case — a date-partition filter, a tenant with no data yet, or a
  * fully-deduplicated batch all produce them mid-pipeline — so every
  * operator must either return an empty (or well-defined) result or fail
  * LOUDLY with a named require(); an NPE or NoSuchElementException out of
  * a driver-side .head/.collect is a latent production crash.
  *
  * Usage: graft.tools.EmptyInputCheck [sfDir] — prints one line per
  * query: `ok(N)` for a successful run (N result rows), `REQUIRE: msg`
  * for a loud, named failure (acceptable — the operator refuses
  * explicitly), or `CRASH: exception` for anything else. Exits nonzero
  * if any CRASH is found.
  */
object EmptyInputCheck {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val empty = java.nio.file.Files.createTempDirectory("graft_empty").toString
    tables.foreach { t =>
      // limit(0) BEFORE the loader's nano→micro conversion: the empty dir
      // must mirror the raw fixture schemas exactly as the driver wrote them
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$empty/$t.parquet")
    }
    var crashed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val outcome =
        try s"ok(${fn(spark, empty).count()})"
        catch {
          case e: IllegalArgumentException => s"REQUIRE: ${first(e)}"
          case e: Throwable =>
            // a raise_error() or require() wrapped by Spark's runtime is
            // still a loud, named refusal
            val root = rootCause(e)
            if (root.isInstanceOf[IllegalArgumentException] ||
              e.getClass.getName.contains("SparkRuntimeException") &&
                String.valueOf(e.getMessage).contains("USER_RAISED_EXCEPTION"))
              s"REQUIRE: ${first(root)}"
            else { crashed += 1; s"CRASH: ${e.getClass.getSimpleName}: ${first(e)}" }
        }
      println(s"[empty] $name $outcome")
      spark.catalog.clearCache()
    }
    println(s"[empty] done, $crashed crashes")
    spark.stop()
    if (crashed > 0) sys.exit(1)
  }

  private def rootCause(e: Throwable): Throwable =
    if (e.getCause == null || e.getCause == e) e else rootCause(e.getCause)

  private def first(e: Throwable): String =
    String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)
}
