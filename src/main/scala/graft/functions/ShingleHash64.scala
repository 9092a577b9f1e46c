package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** All n-word shingle hashes of a word array in one pass:
  * `graft_shingles(w, n)` ≡
  * `transform(sequence(1, size(w)-n+1), i -> xxhash64(concat_ws(' ', slice(w, i, n))))`
  * bit-for-bit (xxhash64 seed 42 over the exact space-joined shingle
  * bytes; null words skipped like concat_ws), but ~10× faster: the HOF
  * form interprets four nested lambdas per shingle and rebuilds each
  * shingle string through generic expression eval — measured 1.7 s for
  * 250 k shingles at sf0.1 (7 µs/shingle), the hot path of every
  * shingle-based operator. Here each word's bytes are fetched once per
  * row and each shingle is one buffer-join + one XXH64 call.
  *
  * CodegenFallback for the same reason as [[MinHashSig16]]: the win is
  * escaping per-element lambda interpretation, not codegen inlining.
  */
case class ShingleHash64(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles width must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    val count = m - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    // fetch every word's bytes once; null words behave like concat_ws
    // (skipped entirely, no separator)
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) = if (ws.isNullAt(i)) null else ws.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](count)
    var buf = new Array[Byte](64)
    var s = 0
    while (s < count) {
      var len = 0
      var j = s
      var first = true       // separator before every non-null element but
      while (j < s + n) {    // the first — an EMPTY word still separates
        val b = bytes(j)
        if (b != null) {
          val need = len + b.length + 1
          if (need > buf.length) {
            val grown = new Array[Byte](math.max(need, buf.length * 2))
            System.arraycopy(buf, 0, grown, 0, len)
            buf = grown
          }
          if (!first) { buf(len) = ' '; len += 1 }
          System.arraycopy(b, 0, buf, len, b.length)
          len += b.length
          first = false
        }
        j += 1
      }
      out(s) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64 {
  private[functions] val ident = new FunctionIdentifier("graft_shingles")
  private[functions] val info =
    new ExpressionInfo(classOf[ShingleHash64].getName, "graft_shingles")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "graft_shingles takes (array<string>, n)")
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_shingles width must be an int literal, got $other")
    }
    ShingleHash64(exprs.head, n)
  }

  /** Idempotent per-session registration (see DotProduct.register). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
