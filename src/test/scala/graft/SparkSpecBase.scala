package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — Spark's
  * getOrCreate makes this safe across suites and saves ~8 s per suite). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfSmoke = "/root/testdata/sf0.001"
  val sfOracle = "/root/testdata/sf0.01"
}

object SparkSpecBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // per-process warehouse: the suite must not race a concurrently
    // running Verify/Bench JVM on ./spark-warehouse (Scratch.warehouseDir)
    .config("spark.sql.warehouse.dir", Scratch.warehouseDir)
    // sized for the ~400-query board (Bench.scala has the rationale);
    // the suite drives the same queries and pays the same eviction tax
    .config("spark.sql.codegen.cache.maxEntries", "4096")
    .getOrCreate()
}
