package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Scratch.warehouseDir).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SF", "/root/testdata/sf0.1")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(s, sf).count()
      val t0 = System.nanoTime(); fn(s, sf).count()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    println("CACHED_RDDS " + s.sparkContext.getPersistentRDDs.size)
    s.stop()
  }
}
