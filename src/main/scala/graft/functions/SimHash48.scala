package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 48-bit SimHash over an array of 64-bit word hashes.
  *
  * Bit j of the result is set iff the majority vote of the inputs' j-th
  * bits is positive (ties count positive). Replaces the interpreted
  * two-level higher-order `aggregate(sequence(0,47), ... aggregate(hs,
  * ...))` formulation — same result, but a compiled words×48 primitive
  * loop instead of ~1200 boxed lambda steps per document.
  *
  * Null semantics: null input array → null; null elements are skipped
  * (a missing word contributes no votes).
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash48 requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash48"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](48)
    var i = 0
    while (i < hs.numElements()) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 48) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 48) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, hs => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[48];
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < 48; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 48; $j++) {
         |  if ($votes[$j] >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  private[functions] val ident = new FunctionIdentifier("graft_simhash48")
  private[functions] val info =
    new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash48")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 1, "graft_simhash48 takes exactly 1 argument")
    SimHash48(exprs.head)
  }

  /** Idempotent per-session registration (see DotProduct.register). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
