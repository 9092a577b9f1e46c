package graft

import org.apache.spark.sql.SparkSession

/** Cost-dispatch crossover probe (r12 verdict ask #5): times BOTH sides
  * of dedupContainment's grid-vs-prefix dispatch on a given corpus dir
  * and reports which side the 512 MB estimated-input threshold would
  * pick vs which side actually wins — a wrong sizeInBytes estimate at
  * 100 TB would silently pick the quadratic grid, and this probe is how
  * the threshold was validated on organic (ScaleGen) corpora instead of
  * an exponent extrapolation.
  *
  * Protocol: warm run + min-of-2 per path, grid first (the probe is also
  * the differential check — both paths must return the same row count).
  *
  * Usage: runMain graft.DispatchProbe <sfDir> [<sfDir2> ...]
  * Output: one JSON line per dir (stdout).
  */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    // the JSON line below uses f"%.2f": pin the locale so a
    // decimal-comma default cannot emit invalid JSON
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
    for (dir <- args) {
      val docs = graft.operators.Dedup.jaccardDocs(spark, dir)
      val est = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      // honors SPARK_GRAFT_PROBE_RUNS like ScaleProbe: at deep corpora a
      // single minutes-long run is the whole measurement (JIT noise is
      // seconds), and warm+min-of-2 would triple it
      val runs = scala.util.Try(
        sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt)
        .getOrElse(2).max(1)
      def minOf2(f: => Long): (Double, Long) = {
        var rows = 0L
        if (runs > 1) rows = f // warm
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime(); rows = f
          (System.nanoTime() - t0) / 1e9
        }
        (times.min, rows)
      }
      val (tGrid, nGrid) = minOf2(
        graft.operators.Dedup.containmentGridJoin(docs).count())
      val (tPrefix, nPrefix) = minOf2(
        graft.operators.Dedup.containmentPrefixJoin(docs).count())
      val picked = if (graft.operators.Dedup.containmentPicksGrid(docs))
        "grid" else "prefix"
      val faster = if (tGrid <= tPrefix) "grid" else "prefix"
      println(f"""{"dir":"$dir","estMB":${est / (1 << 20)},""" +
        f""""tGrid":$tGrid%.2f,"tPrefix":$tPrefix%.2f,""" +
        s""""rows":$nGrid,"rowsEqual":${nGrid == nPrefix},""" +
        s""""picked":"$picked","faster":"$faster",""" +
        s""""agree":${picked == faster}}""")
      System.out.flush()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
