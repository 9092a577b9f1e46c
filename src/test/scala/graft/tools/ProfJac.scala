package graft
import org.apache.spark.sql.SparkSession
object ProfJac {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    spark.read.parquet(s"$sf/region.parquet").count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    t("full_cold")(operators.Dedup.dedupNgramJaccard(spark, sf).count())
    t("full_warm")(operators.Dedup.dedupNgramJaccard(spark, sf).count())
    spark.stop()
  }
}
