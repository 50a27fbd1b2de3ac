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

/** Mergeable quantile-sketch buffer: a KLL/MRL-style compactor hierarchy
  * (Karnin/Lang/Liberman FOCS 2016; Manku/Rajagopalan/Lindsay SIGMOD
  * 1998 for the deterministic compactor) with DETERMINISTIC alternating
  * parity instead of coin flips, and a SELF-CERTIFIED rank-error bound:
  * compacting a sorted weight-2^i buffer to alternate elements shifts any
  * rank by at most 2^i, so `errBound += 2^i` per compaction is a sound
  * worst-case certificate carried in the state — the sketch REPORTS how
  * wrong it can be (the [[Kmv]]/[[MisraGries]] certify-or-refuse house
  * rule), and `errBound == 0` certifies exact answers.
  */
private[functions] final class QSketch(val k: Int) extends Serializable {
  var n: Long = 0L
  var errBound: Long = 0L
  /** level i holds weight-2^i items; buffers stay unsorted until compaction */
  var levels: Array[Array[Double]] = Array(new Array[Double](k))
  var sizes: Array[Int] = Array(0)
  var parity: Array[Boolean] = Array(false)

  private def ensureLevel(i: Int): Unit =
    if (i >= levels.length) {
      levels = levels.padTo(i + 1, null).zipWithIndex
        .map { case (b, j) => if (b == null) new Array[Double](k) else b }
      sizes = sizes.padTo(i + 1, 0)
      parity = parity.padTo(i + 1, false)
    }

  def insert(v: Double): Unit = {
    levels(0)(sizes(0)) = v
    sizes(0) += 1
    n += 1
    if (sizes(0) >= k) compact(0)
  }

  /** Sort level `i`, promote alternate elements to level i+1, flip parity,
    * charge 2^i to the certificate; cascade if i+1 fills. */
  def compact(i: Int): Unit = {
    val m = sizes(i)
    if (m < 2) return
    java.util.Arrays.sort(levels(i), 0, m)
    ensureLevel(i + 1)
    // weight conservation: pairs over [0, even) promote one element each
    // (double weight); an odd LAST element stays at level i untouched —
    // promoting it too would inflate total weight by 2^i
    val even = m - (m % 2)
    val start = if (parity(i)) 1 else 0
    parity(i) = !parity(i)
    var j = start
    while (j < even) {
      levels(i + 1)(sizes(i + 1)) = levels(i)(j)
      sizes(i + 1) += 1
      j += 2
    }
    if (m % 2 == 1) {
      levels(i)(0) = levels(i)(m - 1)
      sizes(i) = 1
    } else sizes(i) = 0
    errBound += 1L << i
    if (sizes(i + 1) >= k) compact(i + 1)
  }

  def mergeIn(o: QSketch): Unit = {
    require(o.k == k, s"cannot merge quantile sketches with k=${o.k} into k=$k")
    n += o.n
    errBound += o.errBound
    var i = 0
    while (i < o.levels.length) {
      ensureLevel(i)
      var j = 0
      while (j < o.sizes(i)) {
        if (sizes(i) >= k) compact(i)
        levels(i)(sizes(i)) = o.levels(i)(j)
        sizes(i) += 1
        j += 1
      }
      if (sizes(i) >= k) compact(i)
      i += 1
    }
  }

  /** (value, weight) pairs sorted by value. */
  def weighted(): (Array[Double], Array[Long]) = {
    var total = 0
    var i = 0
    while (i < sizes.length) { total += sizes(i); i += 1 }
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var o = 0
    i = 0
    while (i < sizes.length) {
      var j = 0
      while (j < sizes(i)) {
        vs(o) = levels(i)(j); ws(o) = 1L << i; o += 1; j += 1
      }
      i += 1
    }
    val idx = (0 until total).toArray.sortBy(vs)
    (idx.map(vs), idx.map(ws))
  }
}

/** Native quantile-sketch aggregate `graft_quantiles(x, k, probs)`:
  * state is ≤ k·log2(n/k) doubles per partial (merges map-side), the
  * answer is the lower nearest-rank quantile for each requested
  * probability, and the output CARRIES the certificate — (n,
  * max_rank_err, is_exact, qs): every reported quantile's true rank is
  * within ±max_rank_err of its target, and `is_exact` (no compaction
  * anywhere) certifies exact nearest-rank answers — which is what makes
  * the operator oracle-checkable at test scale while the estimator
  * regime is spec-pinned against its own certificate.
  *
  * Deterministic by construction (alternating-parity compaction, no
  * coin flips): same data in the same partition layout reproduces
  * bit-identically; across layouts only the certificate's guarantee is
  * portable (the [[MisraGries]] counter-values caveat).
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch]
  with UnaryLike[Expression] {

  require(k >= 4 && k % 2 == 0, s"need even k >= 4, got $k")
  require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
    s"probabilities must lie in (0, 1], got $probs")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double column (cast first), got ${child.dataType.catalogString}")
    }

  override def prettyName: String = "graft_quantiles"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("max_rank_err", LongType, nullable = false),
    StructField("is_exact", BooleanType, nullable = false),
    StructField("qs", ArrayType(DoubleType, containsNull = true), nullable = false)))

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: QSketch, b2: QSketch): QSketch = { b1.mergeIn(b2); b1 }

  override def eval(buf: QSketch): Any = {
    val (vs, ws) = buf.weighted()
    val qs = new Array[Any](probs.length)
    var pi = 0
    while (pi < probs.length) {
      if (buf.n == 0L) qs(pi) = null
      else {
        // lower nearest-rank: smallest value whose cumulative weight
        // reaches ceil(p * n)
        val target = math.ceil(probs(pi) * buf.n).toLong.max(1L)
        var cum = 0L
        var i = 0
        var ans = vs.lastOption.getOrElse(Double.NaN)
        var found = false
        while (i < vs.length && !found) {
          cum += ws(i)
          if (cum >= target) { ans = vs(i); found = true }
          i += 1
        }
        qs(pi) = ans
      }
      pi += 1
    }
    InternalRow(buf.n, buf.errBound, buf.errBound == 0L, new GenericArrayData(qs))
  }

  override def serialize(buf: QSketch): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.k); out.writeLong(buf.n); out.writeLong(buf.errBound)
    out.writeInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      out.writeInt(buf.sizes(i)); out.writeBoolean(buf.parity(i))
      var j = 0
      while (j < buf.sizes(i)) { out.writeDouble(buf.levels(i)(j)); j += 1 }
      i += 1
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val buf = new QSketch(kk)
    buf.n = in.readLong(); buf.errBound = in.readLong()
    val nl = in.readInt()
    buf.levels = Array.fill(nl)(new Array[Double](kk))
    buf.sizes = new Array[Int](nl)
    buf.parity = new Array[Boolean](nl)
    var i = 0
    while (i < nl) {
      buf.sizes(i) = in.readInt(); buf.parity(i) = in.readBoolean()
      var j = 0
      while (j < buf.sizes(i)) { buf.levels(i)(j) = in.readDouble(); j += 1 }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** [[QuantileSketchAgg]] evaluating to its SERIALIZED STATE instead of
  * quantiles — the persist-and-merge-later form ([[graft.streaming
  * .StreamingQuantiles]] lands one state row per micro-batch and merges
  * history driver-side; the KMV SketchSchema discipline). */
case class QuantileSketchStateAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch]
  with UnaryLike[Expression] {

  private val inner = QuantileSketchAgg(child, k, Seq(0.5))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    inner.checkInputDataTypes()
  override def prettyName: String = "graft_quantiles_state"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QSketch = new QSketch(k)
  override def update(buf: QSketch, input: InternalRow): QSketch = inner.update(buf, input)
  override def merge(b1: QSketch, b2: QSketch): QSketch = { b1.mergeIn(b2); b1 }
  override def eval(buf: QSketch): Any = serialize(buf)
  override def serialize(buf: QSketch): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch = inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchStateAgg =
    copy(child = newChild)
}

/** [[QSketch]] plus EXACT bounded tails — the tail-quantile answer to
  * SURVEY §12.b's REQ item, in the house certify-or-refuse style: REQ
  * (Cormode et al., PODS 2021) buys relative rank error with randomized
  * exponentially-protected compactors; this keeps the deterministic KLL
  * core and adds exact min-t/max-t side buffers instead. Any quantile
  * whose tail mass fits the buffer — `ceil(p·n) ≤ t` from below or
  * `n − ceil(p·n) < t` from above — answers EXACTLY (certified rank
  * error 0, strictly tighter than the KLL ±errBound certificate at the
  * same state scale); everything else falls back to the KLL estimate
  * and SAYS so per quantile. Deterministic, mergeable (the union of
  * per-partition top-t sets contains the global top-t), state =
  * KLL + 2t doubles. The honest trade vs REQ: exactness holds while
  * (1−p)·n ≤ t — p99.9 exact to n ≈ 1000·t — rather than ε·r error at
  * every n; the certificate REPORTS which regime each answer is in. */
private[functions] final class TailQSketch(val k: Int, val t: Int) extends Serializable {
  val core = new QSketch(k)
  /** unsorted staging; sorted+truncated to t when they reach 2t */
  var lo: Array[Double] = new Array[Double](2 * t)
  var hi: Array[Double] = new Array[Double](2 * t)
  var loN = 0
  var hiN = 0

  private def shrink(): Unit = {
    if (loN > t) {
      java.util.Arrays.sort(lo, 0, loN)
      loN = t
    }
    if (hiN > t) {
      java.util.Arrays.sort(hi, 0, hiN)
      System.arraycopy(hi, hiN - t, hi, 0, t)
      hiN = t
    }
  }

  def insert(v: Double): Unit = {
    core.insert(v)
    lo(loN) = v; loN += 1
    hi(hiN) = v; hiN += 1
    if (loN >= 2 * t || hiN >= 2 * t) shrink()
  }

  def mergeIn(o: TailQSketch): Unit = {
    require(o.k == k && o.t == t,
      s"cannot merge tail sketches with (k=${o.k}, t=${o.t}) into (k=$k, t=$t)")
    core.mergeIn(o.core)
    var i = 0
    while (i < o.loN) {
      lo(loN) = o.lo(i); loN += 1
      if (loN >= 2 * t) shrink()
      i += 1
    }
    i = 0
    while (i < o.hiN) {
      hi(hiN) = o.hi(i); hiN += 1
      if (hiN >= 2 * t) shrink()
      i += 1
    }
  }

  /** The smallest min(t, n) values ascending / largest min(t, n)
    * descending-from-position-0... both returned ascending. */
  def loSorted(): Array[Double] = {
    java.util.Arrays.sort(lo, 0, loN)
    if (loN > math.min(t.toLong, core.n).toInt) loN = math.min(t.toLong, core.n).toInt
    java.util.Arrays.copyOfRange(lo, 0, loN)
  }
  def hiSorted(): Array[Double] = {
    java.util.Arrays.sort(hi, 0, hiN)
    val keep = math.min(math.min(t.toLong, core.n), hiN.toLong).toInt
    System.arraycopy(hi, hiN - keep, hi, 0, keep)
    hiN = keep
    java.util.Arrays.copyOfRange(hi, 0, hiN)
  }
}

/** Tail-exact quantile aggregate `graft_tail_quantiles(x, k, t, probs)` —
  * output (n, max_rank_err, qs, q_exact): `q_exact(i)` certifies that
  * `qs(i)` is the EXACT lower nearest-rank quantile (its target rank was
  * served by an exact tail buffer, or the core never compacted);
  * otherwise the KLL certificate `max_rank_err` applies. */
case class TailQuantileSketchAgg(
    child: Expression,
    k: Int,
    t: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TailQSketch]
  with UnaryLike[Expression] {

  require(k >= 4 && k % 2 == 0, s"need even k >= 4, got $k")
  require(t >= 1, s"need tail size t >= 1, got $t")
  require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
    s"probabilities must lie in (0, 1], got $probs")

  private val inner = QuantileSketchAgg(child, k, probs)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    inner.checkInputDataTypes()
  override def prettyName: String = "graft_tail_quantiles"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("max_rank_err", LongType, nullable = false),
    StructField("qs", ArrayType(DoubleType, containsNull = true), nullable = false),
    StructField("q_exact", ArrayType(BooleanType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): TailQSketch = new TailQSketch(k, t)

  override def update(buf: TailQSketch, input: InternalRow): TailQSketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: TailQSketch, b2: TailQSketch): TailQSketch = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: TailQSketch): Any = {
    val n = buf.core.n
    val lo = buf.loSorted()
    val hi = buf.hiSorted()
    val qs = new Array[Any](probs.length)
    val exact = new Array[Any](probs.length)
    var pi = 0
    while (pi < probs.length) {
      if (n == 0L) { qs(pi) = null; exact(pi) = false }
      else {
        val target = math.ceil(probs(pi) * n).toLong.max(1L)
        if (target <= lo.length) {
          qs(pi) = lo((target - 1).toInt); exact(pi) = true
        } else if (n - target < hi.length) {
          // hi holds ranks n-hi.length+1 .. n ascending
          qs(pi) = hi((target - (n - hi.length) - 1).toInt); exact(pi) = true
        } else {
          qs(pi) = QuantileSketch.valueAtRank(buf.core, target).map(Double.box).orNull
          exact(pi) = buf.core.errBound == 0L
        }
      }
      pi += 1
    }
    InternalRow(n, buf.core.errBound,
      new GenericArrayData(qs), new GenericArrayData(exact))
  }

  override def serialize(buf: TailQSketch): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.k); out.writeInt(buf.t)
    val coreBytes = inner.serialize(buf.core)
    out.writeInt(coreBytes.length); out.write(coreBytes)
    val lo = buf.loSorted()
    val hi = buf.hiSorted()
    out.writeInt(lo.length); lo.foreach(out.writeDouble)
    out.writeInt(hi.length); hi.foreach(out.writeDouble)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TailQSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val tt = in.readInt()
    val buf = new TailQSketch(kk, tt)
    val coreBytes = new Array[Byte](in.readInt())
    in.readFully(coreBytes)
    val core = inner.deserialize(coreBytes)
    buf.core.n = core.n; buf.core.errBound = core.errBound
    buf.core.levels = core.levels; buf.core.sizes = core.sizes
    buf.core.parity = core.parity
    buf.loN = in.readInt()
    var i = 0
    while (i < buf.loN) { buf.lo(i) = in.readDouble(); i += 1 }
    buf.hiN = in.readInt()
    i = 0
    while (i < buf.hiN) { buf.hi(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TailQuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TailQuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TailQuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketch {

  /** Aggregate column: tail-exact quantiles — (n, max_rank_err, qs,
    * q_exact) with per-quantile exactness certificates (see
    * [[TailQSketch]]). */
  def tailSketch(x: Column, k: Int, t: Int, probs: Seq[Double]): Column =
    ColumnShim.column(
      TailQuantileSketchAgg(ColumnShim.expression(x), k, t, probs).toAggregateExpression())
  /** Aggregate column: (n, max_rank_err, is_exact, qs[...]) — the lower
    * nearest-rank quantile per probability with a sound worst-case rank
    * certificate. Composes with `groupBy`. */
  def sketch(x: Column, k: Int, probs: Seq[Double]): Column =
    ColumnShim.column(
      QuantileSketchAgg(ColumnShim.expression(x), k, probs).toAggregateExpression())

  /** Aggregate column: the sketch's serialized STATE (binary) — persist it
    * and merge later with [[merged]]. */
  def stateSketch(x: Column, k: Int): Column =
    ColumnShim.column(
      QuantileSketchStateAgg(ColumnShim.expression(x), k).toAggregateExpression())

  /** Driver-side merge of serialized states (all must share one k). */
  private[graft] def merged(states: Seq[Array[Byte]]): QSketch = {
    require(states.nonEmpty, "nothing to merge")
    val agg = QuantileSketchStateAgg(null, 4)
    val ss = states.map(agg.deserialize)
    val ks = ss.map(_.k).distinct
    require(ks.size == 1,
      s"mixed sketch k across states (${ks.sorted.mkString(", ")}) — quantile " +
        "states are only mergeable under one k")
    val out = ss.head
    ss.tail.foreach(out.mergeIn)
    out
  }

  /** Sketch-rank interval of value `v`: (weight strictly below v, weight
    * at or below v) — true ranks lie within ± the sketch's errBound. */
  private[graft] def rankBounds(s: QSketch, v: Double): (Long, Long) = {
    val (vs, ws) = s.weighted()
    var below = 0L
    var atOrBelow = 0L
    var i = 0
    while (i < vs.length) {
      if (vs(i) < v) below += ws(i)
      if (vs(i) <= v) atOrBelow += ws(i)
      i += 1
    }
    (below, atOrBelow)
  }

  /** Sketch value at (1-based) rank `r`, clamped into [1, n]. */
  private[graft] def valueAtRank(s: QSketch, r: Long): Option[Double] = {
    if (s.n == 0L) return None
    val target = r.max(1L).min(s.n)
    val (vs, ws) = s.weighted()
    var cum = 0L
    var i = 0
    while (i < vs.length) {
      cum += ws(i)
      if (cum >= target) return Some(vs(i))
      i += 1
    }
    vs.lastOption
  }

  /** Lower nearest-rank quantiles off a merged driver-side sketch. */
  private[graft] def quantilesOf(s: QSketch, probs: Seq[Double]): Seq[Option[Double]] = {
    val (vs, ws) = s.weighted()
    probs.map { p =>
      if (s.n == 0L) None
      else {
        val target = math.ceil(p * s.n).toLong.max(1L)
        var cum = 0L
        var i = 0
        var ans = Option.empty[Double]
        while (i < vs.length && ans.isEmpty) {
          cum += ws(i)
          if (cum >= target) ans = Some(vs(i))
          i += 1
        }
        ans.orElse(vs.lastOption)
      }
    }
  }
}
