package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Over-cap connected-components probe (r13 verdict ask #4): times the
  * full graph_connected_components pipeline on over-the-1M-edge-cap
  * corpora with the edge checkpoint finalized EAGERLY vs LAZILY, so the
  * eager-vs-lazy trade is a measurement instead of a comment — and so
  * the 30×/100× endpoints give a post-cliff exponent with the
  * driver→iterative dispatch cliff OUTSIDE the interval (the r13 10×
  * endpoint sat under the cap, conflating the cliff with the loop's
  * log-rounds).
  *
  * Protocol: per dir, per variant, SPARK_GRAFT_PROBE_RUNS timed runs
  * (min reported; default 1 — over-cap runs are minutes long and JIT
  * noise is seconds). Row counts must agree between variants.
  *
  * Usage: runMain graft.CcProbe <sfDir> [<sfDir2> ...]
  * Output: one JSON line per dir (stdout).
  */
object CcProbe {
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
      val edges = graft.operators.Dedup.dedupNgramJaccard(spark, dir)
        .select(col("id1").as("a"), col("id2").as("b"))
      val nodes = Tables.documents(spark, dir).select(col("doc_id").as("id"))
      val nEdges = edges.count()
      def minOf(eager: Boolean): (Double, Long) = {
        var rows = 0L
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          rows = graft.operators.Dedup
            .connectedComponents(nodes, edges, maxIters = -1,
                                 eagerEdges = eager)
            .count()
          (System.nanoTime() - t0) / 1e9
        }
        (times.min, rows)
      }
      val (tLazy, nLazy) = minOf(eager = false)
      val (tEager, nEager) = minOf(eager = true)
      println(f"""{"dir":"$dir","edges":$nEdges,""" +
        f""""tLazy":$tLazy%.2f,"tEager":$tEager%.2f,""" +
        s""""rows":$nLazy,"rowsEqual":${nLazy == nEager},""" +
        s""""overCap":${nEdges > graft.operators.Dedup.CcLocalMaxEdges}}""")
      System.out.flush()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
