package graft
import org.apache.spark.sql.SparkSession
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Scratch.warehouseDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (k <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir).count()
      println(f"TIME $k run$i ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
