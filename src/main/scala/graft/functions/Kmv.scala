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

/** KMV (bottom-k) distinct sketch as a native Catalyst aggregate — the
  * set-arithmetic member of the mergeable-sketch family, next to
  * [[MisraGriesAgg]] (frequent items) and Spark's `hll_sketch_agg`
  * (union-only cardinality). The buffer is the k smallest DISTINCT
  * values of the (already-hashed, LONG) child: ≤ k longs per
  * (mapper, group) on the wire regardless of row count, merged by
  * bounded union — the same `TypedImperativeAggregate` integration
  * point, so it composes with `groupBy` for per-group sketches.
  *
  * Unlike HLL, two KMV sketches support INTERSECTION estimation
  * ([[graft.operators.Sketches.overlapMatrix]]), and a sketch that
  * never filled (fewer than k distinct values) IS the exact distinct
  * hash set — the certified-exact regime the overlap operators exploit.
  * Output is the sorted-ascending ARRAY<BIGINT> sketch.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "need k >= 2 sketch slots")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a LONG key column (hash upstream, e.g. " +
          s"xxhash64(text)), got ${child.dataType.catalogString}")
    }
  override def prettyName: String = "graft_kmv"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) { if (buf.add(h)) { buf.pollLast(); () } }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long], b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    // b2 ascending: once b1 is full and the next candidate is not below
    // b1's max, no later one can be either
    val it = b2.iterator()
    var open = true
    while (open && it.hasNext) {
      val h = it.next().longValue()
      if (b1.size < k) { b1.add(h); () }
      else if (h < b1.last) { if (b1.add(h)) { b1.pollLast(); () } }
      else open = false
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object Kmv {
  /** Column form: KMV bottom-k sketch of a LONG key column. */
  def sketch(key: Column, k: Int): Column =
    ColumnShim.column(
      KmvAgg(ColumnShim.expression(key), k).toAggregateExpression())
}
