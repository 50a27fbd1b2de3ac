package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded top-k state: the best `k` (score, id) pairs seen so far under
  * the total order (score DESC, id ASC), held as a binary heap whose ROOT
  * is the worst kept entry — an `offer` against a full heap is one root
  * compare (O(1) reject for the overwhelmingly common below-threshold
  * row) and O(log k) on replace. Parallel primitive arrays: no boxing,
  * no per-row allocation. */
final class TopKHeap(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  // "worse" = loses under (score desc, id asc): lower score, or same score
  // and larger id. NaN scores are worst of all (never beat a real score).
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  def offer(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      var i = size - 1 // sift up
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else i = 0
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (l + 1 < size && worse(scores(l + 1), ids(l + 1), scores(m), ids(m))) m = l + 1
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }
}

/** Group-wise top-k as a native Catalyst aggregate — the bounded
  * alternative to the `row_number() OVER (PARTITION BY g ORDER BY s)`
  * idiom, whose window form shuffles and per-partition-sorts EVERY row of
  * the corpus. As an aggregate the state is ≤ k entries per (mapper,
  * group): partials reduce map-side, only k·groups tiny pairs cross the
  * wire, and there is no sort anywhere (heap order is enough; the final
  * k·log k sort happens once per group at eval). Same integration point
  * as `hll_sketch_agg`/[[MisraGriesAgg]], so it composes with `groupBy`
  * and streaming state merges.
  *
  * Exact, not a sketch: (score desc, id asc) is a total order, so the
  * merged top-k equals the global top-k regardless of data layout —
  * unlike Misra-Gries there is no slack to certify. Rows with a NULL
  * score or id are ignored (SQL aggregate convention). */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap]
  with BinaryLike[Expression] {

  require(k >= 1, "need k >= 1")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double score, bigint id), got " +
          s"(${score.dataType.catalogString}, ${id.dataType.catalogString}) — cast first")
    }

  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))))

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  /** Best-first: (score desc, id asc). */
  override def eval(buf: TopKHeap): Any = {
    val idx = Array.range(0, buf.size).sortBy(i => (-buf.scores(i), buf.ids(i)))
    val rows = idx.map(i => InternalRow(buf.ids(i), buf.scores(i)))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = new TopKHeap(k)
    var i = 0
    while (i < n) { heap.offer(in.readDouble(), in.readLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)
}

object TopK {
  /** Aggregate column: the exact top `k` (id, score) pairs under
    * (score desc, id asc), best first. Composes with `groupBy`. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnShim.column(
      TopKAgg(ColumnShim.expression(score.cast("double")),
        ColumnShim.expression(id.cast("long")), k).toAggregateExpression())
}
