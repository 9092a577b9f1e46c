package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated corpus (TESTDATA.md). One parquet file
  * per table under the scale-factor directory passed to each query.
  *
  * Scale design note (100 TB): every loader is a plain parquet scan, so
  * Catalyst's `ColumnPruning` / `PushDownPredicates` reach the file source
  * unimpeded — at cluster scale these become row-group skips and column
  * projections on the distributed store. No caching here on purpose: the
  * harness runs each query once, and caching would hide pushdown wins.
  */
object Tables {
  def region(s: SparkSession, sf: String): DataFrame    = s.read.parquet(s"$sf/region.parquet")
  def nation(s: SparkSession, sf: String): DataFrame    = s.read.parquet(s"$sf/nation.parquet")
  def customer(s: SparkSession, sf: String): DataFrame  = s.read.parquet(s"$sf/customer.parquet")
  def supplier(s: SparkSession, sf: String): DataFrame  = s.read.parquet(s"$sf/supplier.parquet")
  def part(s: SparkSession, sf: String): DataFrame      = s.read.parquet(s"$sf/part.parquet")
  def orders(s: SparkSession, sf: String): DataFrame    = s.read.parquet(s"$sf/orders.parquet")
  def lineitem(s: SparkSession, sf: String): DataFrame  = s.read.parquet(s"$sf/lineitem.parquet")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType. Read it as a raw long (legacy conf, runtime-settable)
    * and truncate ns→µs ourselves — exactly what DuckDB does internally, so
    * the oracle sees identical instants. */
  def events(s: SparkSession, sf: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, sf: String): DataFrame = s.read.parquet(s"$sf/documents.parquet")
  def embeddings(s: SparkSession, sf: String): DataFrame = s.read.parquet(s"$sf/embeddings.parquet")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
