package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters as a native Catalyst aggregate — the
  * frequent-items member of the mergeable-sketch family
  * ([[graft.operators.Sketches]] hosts the HLL/quantile members via
  * Spark's built-ins; Spark has no frequent-items aggregate, hence this
  * `TypedImperativeAggregate`, the same integration point
  * `hll_sketch_agg` uses — so it composes with `groupBy` for per-group
  * heavy hitters and its state merges map-side).
  *
  * State is at most `k` (item, counter) pairs per partial — the shuffle
  * moves k counters per (mapper, group) regardless of row count, where an
  * exact top-N's first phase shuffles every distinct item. The classic
  * guarantee (Misra & Gries 1982; merge by Agarwal et al., "Mergeable
  * Summaries", PODS 2012): counters underestimate true counts by at most
  * n/(k+1), so EVERY item with true count > n/(k+1) survives. Counter
  * VALUES are data-split-dependent (only the bound is portable) — exact
  * results come from the two-phase [[graft.operators.Sketches.exactTopN]]
  * which recounts the candidate set exactly.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "need k >= 1 counters")

  // analysis-time type gate (ExpectsInputTypes needs the private[sql]
  // AbstractDataType, so the check is spelled out): a non-string child
  // would otherwise ClassCastException mid-task in update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item column, got ${child.dataType.catalogString}")
    }
  override def prettyName: String = "graft_misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))))

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      // counters are strictly positive (decrementAll removes <= 0), so a
      // zero default means "absent" — no boxed-null unboxing hazard
      val cur = buf.getOrDefault(item, 0L)
      if (cur != 0L) buf.put(item, cur + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else decrementAll(buf, 1L) // the k+1-distinct case: all counters pay
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Long], b2: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from all, drop the non-positive
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(b1.size - k - 1))
    }
    b1
  }

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  /** Candidates sorted (count desc, item asc) — deterministic given the
    * buffer, though counter values themselves depend on data layout. */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val rows = buf.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
      .sortBy(e => (-e.getValue, e.getKey))
      .map(e => InternalRow(UTF8String.fromString(e.getKey), e.getValue))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGries {
  /** Aggregate column: ≤ k (item, count) candidate pairs covering every
    * item with true frequency > n/(k+1). Composes with `groupBy`. */
  def sketch(item: Column, k: Int): Column =
    ColumnShim.column(
      MisraGriesAgg(ColumnShim.expression(item), k).toAggregateExpression())
}
