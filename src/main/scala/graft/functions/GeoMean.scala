package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregator (the `Aggregator[IN, BUF, OUT]` machinery,
  * SURVEY §4 "optional custom"): geometric mean via Σln — numerically
  * the only sane way to multiply 10⁵ prices without overflow.
  * Registered with `functions.udaf`; merge is associative+commutative
  * so partial aggregation (map-side combine) applies as usual.
  *
  * Preconditions (primitive-Double encoder): inputs must be non-null
  * and positive — filter upstream. An empty group yields 0.0 (a
  * primitive OUT cannot encode SQL NULL); don't conflate with a true
  * zero product.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form. */
  def of(c: Column): Column = udaf(GeoMean).apply(c)
}
