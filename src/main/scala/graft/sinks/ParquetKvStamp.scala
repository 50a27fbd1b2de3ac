package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** TRUE parquet file-level key-value footer metadata — the exact surface
  * the reference reads (`pq.read_schema(file).metadata[b"last_modified"]`,
  * wrds2pg/files/parquet.py:28-40). Spark's writer cannot emit custom
  * footer KV pairs, so this rewrites each file's FOOTER after the write:
  * row groups are appended as RAW BYTES (`ParquetFileWriter.appendFile` —
  * no decode, no re-encode, I/O-bound copy), then `end(oldKV ++ kv)`
  * writes a footer carrying both Spark's own schema entry and the new
  * pairs, and the staged file renames over the original.
  *
  * Scale shape: files are independent — the rewrite parallelizes one task
  * per file (the [[graft.sources.Sas7bdat]] per-file discipline), and the
  * copy never touches column decoders. For a table written once and
  * stamped once, the cost is one extra linear read+write of the data —
  * the price of footer metadata parquet itself imposes (footers are
  * physically after the data, so amending one means rewriting the file).
  */
object ParquetKvStamp {

  /** Add (or overwrite) `kv` in the footer of every `*.parquet` file
    * under `path` (non-recursive data files + hive partition dirs). */
  def addKeyValues(
      spark: SparkSession, path: String, kv: Map[String, String]): Unit = {
    require(kv.nonEmpty, "nothing to stamp")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def collect(p: Path): Seq[String] = {
      val st = fs.listStatus(p).toSeq
      st.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString) ++
        st.filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
          .flatMap(d => collect(d.getPath))
    }
    val files = collect(root)
    require(files.nonEmpty, s"no parquet files under $path")
    // ship the SESSION Hadoop conf into the tasks (ADVICE r6 — a fresh
    // executor-side Configuration() drops the credential/endpoint settings
    // the listing above used)
    val confBc = spark.sparkContext.broadcast(
      new graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    spark.sparkContext.parallelize(files, files.size)
      .foreach(f => stampOne(f, kv, confBc.value.value))
  }

  /** Rewrite one file's footer and publish via delete → rename.
    *
    * The publish window is NOT atomic (documented, ADVICE r6): between
    * the delete and the rename a concurrent reader can observe the file
    * absent, and a crash strands the stamped bytes at
    * `.<name>.kvstamp.tmp` (dot-prefixed, invisible to readers) with the
    * original gone. Recovery is mechanical — rename the stranded tmp back
    * into place — and a RE-RUN of [[addKeyValues]] self-heals: stampOne
    * rebuilds the tmp from the original when it exists, and the stranded
    * tmp is replaced (Mode.OVERWRITE) on the next stamp of that file.
    * An atomic overwrite-rename (FileContext/Options.Rename.OVERWRITE)
    * was considered and rejected: it bypasses ChecksumFileSystem, so on
    * file:// it strands stale `.crc` sidecars that poison later reads. */
  private def stampOne(
      file: String, kv: Map[String, String], conf: Configuration): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val in = HadoopInputFile.fromPath(p, conf)
    val (schema, oldKv) = {
      val r = ParquetFileReader.open(in)
      try {
        val fmd = r.getFooter.getFileMetaData
        (fmd.getSchema, fmd.getKeyValueMetaData.asScala.toMap)
      } finally r.close()
    }
    val tmp = new Path(p.getParent, s".${p.getName}.kvstamp.tmp")
    val w = new ParquetFileWriter(conf, schema, tmp, ParquetFileWriter.Mode.OVERWRITE)
    w.start()
    w.appendFile(in) // raw row-group byte copy, no decode
    w.end((oldKv ++ kv).asJava)
    // publish: rename over the original (same-directory rename, the file
    // commit protocol's own assumption; see the scaladoc's window note)
    require(fs.delete(p, false), s"could not remove $p for footer rewrite")
    require(fs.rename(tmp, p),
      s"could not publish stamped footer for $p — the stamped bytes are " +
        s"staged at $tmp; rename it into place to recover")
  }

  /** Footer KV value for `key` from the FIRST parquet file under `path`;
    * "" when absent — `get_modified_pq` semantics. */
  def readKeyValue(spark: SparkSession, path: String, key: String): String = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return ""
    def firstFile(p: Path): Option[Path] = {
      if (fs.getFileStatus(p).isFile) return Some(p)
      val st = fs.listStatus(p).sortBy(_.getPath.getName)
      st.find(s => s.isFile && s.getPath.getName.endsWith(".parquet")).map(_.getPath)
        .orElse(st.filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
          .view.flatMap(d => firstFile(d.getPath)).headOption)
    }
    firstFile(root) match {
      case None => ""
      case Some(f) =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(f, new Configuration(
            spark.sparkContext.hadoopConfiguration)))
        try Option(r.getFooter.getFileMetaData.getKeyValueMetaData.get(key)).getOrElse("")
        finally r.close()
    }
  }
}
