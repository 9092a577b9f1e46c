package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
object ExplainKey {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Scratch.warehouseDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark,
      sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    println(df.queryExecution.explainString(FormattedMode).take(6000))
    spark.stop()
  }
}
