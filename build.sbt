ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bangdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify drivers parse the LAST stdout line as JSON; sbt's
// trailing "[success] Total time: ..." line breaks that, and the default
// logger prefixes every forked-process line with "[info] "/"[error] ",
// which would make the JSON line itself unparseable. Suppress the success
// line and pass forked output through verbatim.
Global / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Size the forked JVM to the machine, not a constant (optimization guide
// §5: executor memory layout; §1.2: config after algorithm). local-mode
// Spark runs the driver AND every executor task slot in ONE JVM, so at
// local[32] the old fixed 8g heap gave 32 concurrent tasks ~150 MB of
// execution memory each — the full sf0.1 board spent ~25% of its wall
// clock in GC-induced inflation (measured 242.7 s at 8g vs 184.2 s at
// 32g, byte-identical code, quiet host; per-key: graph_kcore 6.7→2.2 s,
// stats_propensity_strat 5.0→1.0 s). Default = clamp(hostRAM/4, 8g, 32g):
// scale-adaptive (a 16 GiB laptop still gets 8g within its means, this
// 128 GiB host gets 32g), conservative (3/4 of RAM stays free for page
// cache and concurrent JVMs), env-overridable for any cluster/driver
// that sizes explicitly. Fallback on unreadable /proc/meminfo: the old 8g.
val hostHeapDefault: String = {
  val memGiB: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().find(_.startsWith("MemTotal"))
        .map(_.trim.split("\\s+")(1).toLong / (1024L * 1024L)).getOrElse(0L)
      finally src.close()
    } catch { case _: Throwable => 0L }
  s"${math.max(8L, math.min(memGiB / 4, 32L))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", hostHeapDefault)}",
  // Pin the initial heap to the max: ParallelGC grows the heap lazily and
  // the growth phase of a ~400-query board pays repeated expansion GCs.
  // Same principle as sizing the heap itself — commit what the batch
  // workload will use (steal-clean A/B: ~149 s without vs ~131 s with,
  // three samples each, sf0.1 full board).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", hostHeapDefault)}",
  // 762 query executions generate thousands of codegen classes; the JIT's
  // default 240 MB code cache can fill mid-board, silently stopping
  // compilation for the rest of the run. 512 MB is cheap (virtual
  // reservation) and removes the cliff.
  "-XX:ReservedCodeCacheSize=512m",
  // Throughput collector for batch analytics (guide §5): G1's concurrent
  // marking competes with 32 busy task threads and its pause-time goal
  // buys nothing in a non-interactive bench/ETL JVM. Same board, same
  // heap: G1 184.2 s vs ParallelGC 176.4 s (and ParallelGC's sample
  // STARTED on a loaded host, load1s 6.18 vs 2.68).
  "-XX:+UseParallelGC",
)
