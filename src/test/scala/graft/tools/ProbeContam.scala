package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeContam {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $name run$i ${(System.nanoTime()-t0)/1e9}%.2f rows=$n")
      }
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
    t("split_only") { docs.count() }
    val plain = docs.select(col("doc_id"), expr(
      "transform(sequence(1, size(w) - 4), i -> xxhash64(concat_ws(' ', slice(w, i, 5))))").as("sh"))
    t("transform_hash") { plain.select(explode(col("sh"))).count() }
    val dist = docs.select(col("doc_id"), expr(
      "array_distinct(transform(sequence(1, size(w) - 4), i -> xxhash64(concat_ws(' ', slice(w, i, 5)))))").as("sh"))
    t("with_array_distinct") { dist.select(explode(col("sh"))).count() }
    t("with_size_and_explode") { dist.select(col("doc_id"), size(col("sh")), explode(col("sh"))).count() }
    spark.stop()
  }
}
