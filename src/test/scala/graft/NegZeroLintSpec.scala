package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Board-wide negative-zero lint (round-9 verdict ask #2).
  *
  * The driver's comparator hashes textual cell values, where −0.0 and
  * +0.0 differ by one sign bit — Spark's `round` (BigDecimal HALF_UP,
  * no signed zero) always emits +0.0 while DuckDB's `round` preserves
  * the IEEE sign, so any `round(a − b, k)` column whose true value is a
  * tiny negative can split the hash while |Δ| = 0 (graph_modularity was
  * the round-8 escape). Contract this spec pins: NO graded query may
  * emit a −0.0 cell on the Spark side, so any such split can only come
  * from the ORACLE side — and tools/oracle_check.py now fails on a
  * zero-sign mismatch, closing the class from both directions.
  *
  * Bit-pattern check (doubleToRawLongBits sign bit at value == 0), not
  * arithmetic: `== -0.0` is true for +0.0 under IEEE equality.
  */
class NegZeroLintSpec extends SparkSpecBase {

  private def negZeroCells(sfDir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sfDir)
      val floatCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }
      if (floatCols.isEmpty) Nil
      else df.select(floatCols.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .flatMap { row =>
          floatCols.indices.flatMap { i =>
            if (row.isNullAt(i)) None
            else {
              val neg = row.get(i) match {
                case d: java.lang.Double =>
                  java.lang.Double.doubleToRawLongBits(d) == java.lang.Double.doubleToRawLongBits(-0.0)
                case fl: java.lang.Float =>
                  java.lang.Float.floatToRawIntBits(fl) == java.lang.Float.floatToRawIntBits(-0.0f)
                case _ => false
              }
              if (neg) Some(s"$name.${floatCols(i)}") else None
            }
          }
        }
        .distinct
    }

  test("no graded query emits a -0.0 double/float cell at sf0.001") {
    val hits = negZeroCells(sfSmoke)
    assert(hits.isEmpty,
      s"\n-0.0 cells (normalize with the `+ 0.0` idiom on BOTH engine " +
        s"and oracle):\n  ${hits.mkString("\n  ")}")
  }

  // Round-8 proved boundary behavior can be SF-dependent (the
  // graph_modularity escape only appeared past sf0.001), and the
  // driver GRADES at sf0.01 — so the lint must run at the grading SF
  // too, not just the smoke SF.
  test("no graded query emits a -0.0 double/float cell at sf0.01") {
    val hits = negZeroCells(sfOracle)
    assert(hits.isEmpty,
      s"\n-0.0 cells (normalize with the `+ 0.0` idiom on BOTH engine " +
        s"and oracle):\n  ${hits.mkString("\n  ")}")
  }
}
