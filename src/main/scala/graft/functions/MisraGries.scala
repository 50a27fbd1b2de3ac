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

/** Fixed-capacity open-addressing long→long counter map for
  * [[MisraGriesLongAgg]]: strictly-positive counters, so `vals(i) == 0`
  * marks an empty slot (no separate state array, no boxing anywhere).
  * Capacity is a power of two ≥ 4k — merge may briefly hold 2k entries
  * before trimming, and load stays ≤ ½ so linear probes are short.
  * Deletions happen only inside [[decrementAll]], which rebuilds the
  * table (O(capacity), the same order as the decrement sweep itself). */
private[functions] final class LongCounters(val k: Int) extends Serializable {
  private val cap: Int = Integer.highestOneBit(math.max(8, 4 * k) - 1) << 1
  private val mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  var size: Int = 0

  private def slot(key: Long, ks: Array[Long], vs: Array[Long]): Int = {
    var i = java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L) & mask
    while (vs(i) != 0L && ks(i) != key) i = (i + 1) & mask
    i
  }

  def get(key: Long): Long = vals(slot(key, keys, vals))

  /** Adds `by` to `key`'s counter, inserting if absent. */
  def add(key: Long, by: Long): Unit = {
    val i = slot(key, keys, vals)
    if (vals(i) == 0L) { keys(i) = key; size += 1 }
    vals(i) += by
  }

  /** Subtracts `by` from every counter, dropping the non-positive. */
  def decrementAll(by: Long): Unit = {
    val nk = new Array[Long](cap)
    val nv = new Array[Long](cap)
    var n = 0
    var i = 0
    while (i < cap) {
      if (vals(i) > by) {
        val j = slot(keys(i), nk, nv)
        nk(j) = keys(i); nv(j) = vals(i) - by
        n += 1
      }
      i += 1
    }
    keys = nk; vals = nv; size = n
  }

  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) { if (vals(i) != 0L) f(keys(i), vals(i)); i += 1 }
  }
}

/** [[MisraGriesAgg]]'s primitive-keyed twin for LONG item streams —
  * 64-bit fingerprints ([[graft.operators.Dedup.shingleHashes]],
  * `xxhash64` keys, numeric ids): the per-update path touches two flat
  * long arrays (no string materialization, no boxing), the guarantee and
  * merge rule are identical. */
case class MisraGriesLongAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongCounters]
  with UnaryLike[Expression] {

  require(k >= 1, "need k >= 1 counters")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint item column, got ${child.dataType.catalogString}" +
          " (hash or cast first; graft_misra_gries handles strings)")
    }

  override def prettyName: String = "graft_misra_gries_long"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("count", LongType, nullable = false))))

  override def createAggregationBuffer(): LongCounters = new LongCounters(k)

  override def update(buf: LongCounters, input: InternalRow): LongCounters = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      if (buf.get(item) != 0L) buf.add(item, 1L)
      else if (buf.size < k) buf.add(item, 1L)
      else buf.decrementAll(1L) // the k+1-distinct case: all counters pay
    }
    buf
  }

  override def merge(b1: LongCounters, b2: LongCounters): LongCounters = {
    b2.foreachEntry((key, c) => b1.add(key, c))
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from all, drop the non-positive
      val counts = new Array[Long](b1.size)
      var i = 0
      b1.foreachEntry((_, c) => { counts(i) = c; i += 1 })
      java.util.Arrays.sort(counts)
      b1.decrementAll(counts(b1.size - k - 1))
    }
    b1
  }

  /** Candidates sorted (count desc, item asc) — deterministic given the
    * buffer, though counter values themselves depend on data layout. */
  override def eval(buf: LongCounters): Any = {
    val entries = new Array[(Long, Long)](buf.size)
    var i = 0
    buf.foreachEntry((key, c) => { entries(i) = (key, c); i += 1 })
    val rows = entries.sortBy { case (key, c) => (-c, key) }
      .map { case (key, c) => InternalRow(key, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: LongCounters): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreachEntry((key, c) => { out.writeLong(key); out.writeLong(c) })
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongCounters = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new LongCounters(k)
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesLongAgg =
    copy(child = newChild)
}

object MisraGries {
  /** Aggregate column: ≤ k (item, count) candidate pairs covering every
    * item with true frequency > n/(k+1). Composes with `groupBy`. */
  def sketch(item: Column, k: Int): Column =
    ColumnShim.column(
      MisraGriesAgg(ColumnShim.expression(item), k).toAggregateExpression())

  /** [[sketch]] for bigint item streams (fingerprints, hashed keys,
    * ids) — primitive counters, no per-update boxing. */
  def sketchLong(item: Column, k: Int): Column =
    ColumnShim.column(
      MisraGriesLongAgg(ColumnShim.expression(item), k).toAggregateExpression())
}
