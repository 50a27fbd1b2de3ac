package graft.tools

import org.apache.spark.sql.functions._

/** Registry-wide null-injection sweep — the [[EmptyInputCheck]] sibling:
  * copy every test table with ~10% of each NULLABLE string/binary column
  * nulled (deterministically, by id hash), then run each query. Real
  * crawl corpora carry null text/urls/payloads mid-pipeline (failed
  * fetches, decode errors); an operator must either flow them through
  * its SQL null semantics or refuse loudly — a bare NPE out of a typed
  * mapPartitions pass (`text.trim` on null) is a latent production
  * crash of exactly the kind column-level code never hits.
  *
  * Results are NOT oracle-compared (nulls legitimately change outputs);
  * the gate is crash vs loud-refusal vs clean run, like EmptyInputCheck.
  */
object NullInputCheck {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = df.schema.fields.foldLeft(df) { (d, f) =>
        val nullable = f.nullable &&
          (f.dataType == org.apache.spark.sql.types.StringType ||
            f.dataType == org.apache.spark.sql.types.BinaryType)
        if (!nullable) d
        else d.withColumn(f.name,
          when(pmod(xxhash64(monotonically_increasing_id(), lit(f.name)), lit(10)) === 0,
            lit(null).cast(f.dataType))
            .otherwise(col(f.name)))
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    var crashed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val outcome =
        try s"ok(${fn(spark, dir).count()})"
        catch {
          case e: IllegalArgumentException => s"REQUIRE: ${first(e)}"
          case e: Throwable =>
            val root = rootCause(e)
            if (root.isInstanceOf[IllegalArgumentException] ||
              e.getClass.getName.contains("SparkRuntimeException") &&
                String.valueOf(e.getMessage).contains("USER_RAISED_EXCEPTION"))
              s"REQUIRE: ${first(root)}"
            else { crashed += 1; s"CRASH: ${root.getClass.getSimpleName}: ${first(root)}" }
        }
      println(s"[nulls] $name $outcome")
      spark.catalog.clearCache()
    }
    println(s"[nulls] done, $crashed crashes")
    spark.stop()
    if (crashed > 0) sys.exit(1)
  }

  private def rootCause(e: Throwable): Throwable =
    if (e.getCause == null || e.getCause == e) e else rootCause(e.getCause)

  private def first(e: Throwable): String =
    String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)
}
