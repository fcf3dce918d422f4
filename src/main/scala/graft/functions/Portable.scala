package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Project-wide conventions shared by every operator module.
  *
  * `truncN` is the engine-portable decimal reduction: truncation has no
  * half-way ties, so identical IEEE inputs give identical results in
  * any engine — unlike `round`, whose tie-breaking differs between
  * Spark (shortest-decimal HALF_UP) and exact-binary engines.
  *
  * `spread` redistributes a small input before CPU-bound per-row work:
  * a small parquet file arrives as 1–2 splits, which would serialize
  * hashing/scoring on one core. At 100 TB the scan already has
  * thousands of splits and the repartition serves balance instead.
  */
object Portable {

  def trunc2(c: Column): Column = floor(c * 100) / 100

  def trunc4(c: Column): Column = floor(c * 10000) / 10000

  def trunc6(c: Column): Column = floor(c * 1000000) / 1000000

  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
