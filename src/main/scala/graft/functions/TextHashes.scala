package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint: the MINIMUM over all length-`k` byte
  * windows of the polynomial hash
  *   H(w) = fold(b in w)( (h * 31 + b) mod 1000000007 ),
  * computed with an O(1)-per-step rolling update. Returns null for texts
  * shorter than `k` bytes.
  *
  * The winnowing-style min-of-rolling-hashes is the classic near-duplicate /
  * containment fingerprint (two documents sharing any k-byte run are likely
  * to share the minimizing window). The polynomial form (instead of
  * xxhash64) is chosen deliberately: it is reproducible in plain SQL on any
  * engine, so the DuckDB oracle computes the identical value. Byte-based —
  * equals the character-based SQL form for ASCII corpora.
  *
  * Codegen'd (doGenCode) so the per-document O(len) loop runs inside
  * WholeStageCodegen like the rest of the scan pipeline.
  */
case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "window must be >= 1")

  private val Mod = 1000000007L
  /** 31^(k-1) mod p — the factor of the outgoing byte. */
  private val pow: Long = (1 until k).foldLeft(1L)((acc, _) => acc * 31 % Mod)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_min_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) null
    else {
      var h = 0L
      var i = 0
      while (i < k) { h = (h * 31 + (bytes(i) & 0xFF)) % Mod; i += 1 }
      var min = h
      while (i < n) {
        h = (((h - (bytes(i - k) & 0xFF) * pow % Mod + Mod) % Mod) * 31 + (bytes(i) & 0xFF)) % Mod
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val bytes = ctx.freshName("bytes")
    val n = ctx.freshName("n")
    val h = ctx.freshName("h")
    val min = ctx.freshName("min")
    val i = ctx.freshName("i")
    val (kL, modL, powL) = (s"$k", s"${Mod}L", s"${pow}L")
    val body =
      s"""
         |if (!${childGen.isNull}) {
         |  byte[] $bytes = ${childGen.value}.getBytes();
         |  int $n = $bytes.length;
         |  if ($n >= $kL) {
         |    long $h = 0L;
         |    int $i = 0;
         |    while ($i < $kL) { $h = ($h * 31L + ($bytes[$i] & 0xFF)) % $modL; $i++; }
         |    long $min = $h;
         |    while ($i < $n) {
         |      $h = ((($h - ($bytes[$i - $kL] & 0xFF) * $powL % $modL + $modL) % $modL)
         |            * 31L + ($bytes[$i] & 0xFF)) % $modL;
         |      if ($h < $min) $min = $h;
         |      $i++;
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = $min;
         |  }
         |}
       """.stripMargin
    ev.copy(code =
      code"""
            |${childGen.code}
            |boolean ${ev.isNull} = true;
            |long ${ev.value} = 0L;
            |$body
          """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashes {
  /** Min rolling polynomial hash over k-byte windows (null if len < k). */
  def rollingMinHash(text: Column, k: Int): Column =
    ColumnShim.column(RollingMinHash(ColumnShim.expression(text), k))
}
