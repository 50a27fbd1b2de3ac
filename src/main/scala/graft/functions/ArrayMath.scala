package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two numeric array columns (float or double
  * elements), accumulated in double with a strict left-to-right fold — the
  * same association order as a sequential `list_reduce`, so results are
  * bit-identical to single-node engines that fold the same way.
  *
  * This replaces `aggregate(zip_with(...))` in the vector-math hot path:
  * higher-order functions drop out of whole-stage codegen and pay an
  * interpreted lambda call per element, which is the difference between
  * minutes and seconds on an all-pairs similarity scan (SURVEY §4).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, t: DataType): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** A d×d rotation (row-major flat) plus the tight mat-vec loop the
  * [[MatVec]] expression executes per row — the [[PqBooks]] pattern: the
  * matrix rides along as a broadcast-by-reference object, the loop runs in
  * plain JVM arrays, and whole-stage codegen keeps fusing around it. */
final class RotMat(val d: Int, val flat: Array[Double]) extends Serializable {
  require(flat.length == d * d, "flat rotation length must be d*d")

  /** R·v as a fresh double array (strict row-major sequential folds). */
  def apply(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val out = new Array[Double](d)
    var r = 0
    while (r < d) {
      val base = r * d
      var s = 0.0
      var i = 0
      while (i < d) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        s += flat(base + i) * x
        i += 1
      }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Rotate a numeric array column by a literal orthogonal matrix — the OPQ
  * encode/search projection ([[graft.operators.Opq]]). One codegen node
  * calling into [[RotMat]]; the d×d doubles are a reference object, not an
  * expression tree (the [[PqBooks]] Janino argument). */
case class MatVec(child: Expression, mat: RotMat) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_matvec"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  override def nullSafeEval(vec: Any): Any =
    mat(vec.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotMat", mat, classOf[RotMat].getName)
    val f = isFloat
    nullSafeCodeGen(ctx, ev, vec => s"${ev.value} = $ref.apply($vec, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points for the vector math expressions. */
object ArrayMath {

  /** Sequential-fold double dot product (codegen'd, WholeStageCodegen-safe). */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** R·v for a literal row-major rotation (array<double> out). */
  def matVec(v: Column, mat: RotMat): Column =
    ColumnShim.column(MatVec(ColumnShim.expression(v), mat))

  /** L2 norm. */
  def norm2(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity, computed exactly as `dot / (sqrt(dot(a,a)) *
    * sqrt(dot(b,b)))` in double — the oracle's association order. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
