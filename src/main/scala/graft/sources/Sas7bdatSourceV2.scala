package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 integration for [[Sas7bdat]]:
  * `spark.read.format("sas7bdat").load(path)`.
  *
  * The win over the plain RDD wrapper is COLUMN PRUNING pushed into the
  * byte decoder ([[SupportsPushDownRequiredColumns]]): sas7bdat rows are
  * fixed-width records, so a pruned column costs zero decode work — no
  * charset decode, no date conversion, no boxing — and
  * `df.select(one_col)` over a wide SAS dataset touches only that column's
  * byte range per row. Partition planning stays one InputPartition per
  * file (the format is a single sequential stream; see [[Sas7bdat]]'s
  * scale note), and every file's schema is verified against the first at
  * planning time.
  */
class Sas7bdatSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sas7bdat"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = Sas7bdatSourceV2.resolveFiles(options.get("path"))
    Sas7bdatSourceV2.verifiedSchema(files)
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new Sas7bdatTable(schema, properties.get("path"))
}

private[sources] object Sas7bdatSourceV2 {
  def resolveFiles(path: String): Seq[String] = {
    require(path != null, "sas7bdat source requires a path")
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).toSeq
          .filter(_.getName.toLowerCase.endsWith(".sas7bdat"))
          .sortBy(_.getName).map(_.toString)
      else Seq(p.toString)
    require(files.nonEmpty, s"no .sas7bdat files under $path")
    files
  }

  def verifiedSchema(files: Seq[String]): StructType = {
    val spark = SparkSession.active
    val schema = Sas7bdat.schemaOf(spark, files.head)
    files.tail.foreach { f =>
      val s = Sas7bdat.schemaOf(spark, f)
      require(s == schema,
        s"schema mismatch in $f: $s does not match ${files.head}: $schema")
    }
    schema
  }
}

private class Sas7bdatTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"sas7bdat(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Sas7bdatScanBuilder(tableSchema, path)
}

private class Sas7bdatScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Sas7bdatScan(full, required, path)
}

private class Sas7bdatScan(full: StructType, required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"sas7bdat $path, columns [${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = Sas7bdatSourceV2.resolveFiles(path)
    Sas7bdatSourceV2.verifiedSchema(files) // fail fast on drift across files
    // positions of the pruned columns within the file's column vector
    val projected = required.fieldNames.map(full.fieldIndex)
    files.map(f => Sas7bdatInputPartition(f, projected): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Sas7bdatReaderFactory
}

private case class Sas7bdatInputPartition(file: String, projected: Array[Int])
    extends InputPartition

private class Sas7bdatReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[Sas7bdatInputPartition]
    val fp = new Path(p.file)
    val fs = fp.getFileSystem(new Configuration())
    val open = () => fs.open(fp): java.io.InputStream
    val meta = Sas7bdat.readMetaFrom(open)
    val it = Sas7bdat.internalRowIterator(open, meta, p.projected)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        val h = it.hasNext
        if (h) current = it.next()
        h
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
