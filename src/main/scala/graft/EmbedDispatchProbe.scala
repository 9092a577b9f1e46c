package graft

import org.apache.spark.sql.SparkSession

/** Crossover probe for dedupEmbedCosine's plain-vs-quantized grid
  * dispatch (the embed twin of DispatchProbe): times BOTH paths on a
  * corpus dir, asserts row-equality (the quantized prescreen is proven
  * lossless — this is the empirical check of that proof at organic
  * scales, beyond the graded-SF differential spec), and reports which
  * side the block-row threshold would pick vs which actually wins.
  *
  * Usage: runMain graft.EmbedDispatchProbe <sfDir> [<sfDir2> ...]
  * Output: one JSON line per dir (stdout). Honors
  * SPARK_GRAFT_PROBE_RUNS (default 1).
  */
object EmbedDispatchProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Scratch.warehouseDir)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.range(1000000L).selectExpr("sum(id)").collect()
    catch { case _: Throwable => () }
    val runs = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "1").toInt)
      .getOrElse(1).max(1)
    for (dir <- args) {
      val e = Tables.embeddings(spark, dir)
      def minOf(f: => Long): (Double, Long) = {
        var rows = 0L
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime(); rows = f
          (System.nanoTime() - t0) / 1e9
        }
        (times.min, rows)
      }
      val (tPlain, nPlain) = minOf(
        graft.operators.Similarity.dedupEmbedCosinePlain(spark, e).count())
      val (tQuant, nQuant) = minOf(
        graft.operators.Similarity.dedupEmbedCosineQuantized(spark, e).count())
      val picked = if (graft.operators.Similarity.embedPicksPlainGrid(e))
        "plain" else "quantized"
      val faster = if (tPlain <= tQuant) "plain" else "quantized"
      println(f"""{"dir":"$dir","tPlain":$tPlain%.2f,"tQuant":$tQuant%.2f,""" +
        s""""rows":$nPlain,"rowsEqual":${nPlain == nQuant},""" +
        s""""picked":"$picked","faster":"$faster",""" +
        s""""agree":${picked == faster}}""")
      System.out.flush()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
