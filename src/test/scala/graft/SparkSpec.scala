package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf: String = "/root/testdata/sf0.001"

  /** Exact long view of a DECIMAL(38,0) column — the overflow-widened
    * aggregate products (round-10 audit) surface as integral decimals;
    * longValueExact throws if a test value ever genuinely exceeds 2^63
    * instead of silently wrapping. */
  def decL(row: org.apache.spark.sql.Row, name: String): Long =
    row.getAs[java.math.BigDecimal](name).longValueExact
}

object SparkSpec {
  // built WITH GraftExtensions, deterministically, before any suite can
  // race to create a non-extended default session: extensions can only
  // be installed at builder time (getOrCreate on an existing session
  // silently ignores withExtensions), so the one JVM-wide session must
  // be the extended one for ExtensionsSpec to be order-independent
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
  }
}
