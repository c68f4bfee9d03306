package graft.dedup

import org.apache.spark.sql.{Dataset, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** One-pass typed MinHash signature aggregator — the
  * `Aggregator[IN, BUF, OUT]` candidate SURVEY §7.5 names: all k minima
  * live in ONE primitive long-array buffer updated per input hash,
  * instead of k separate min-aggregate columns.
  *
  * Same affine universal-hash family ((aᵢ·base + bᵢ) mod P over the
  * md5-derived 28-bit base) and identical output to the declarative
  * [[Dedup.minhashSignatures]] — MinHashAggregatorSpec pins the
  * equality. The declarative form stays the default (whole-stage
  * codegen; the driver's oracle path); this typed form exists for
  * pipelines that already operate on `Dataset[T]` and for buffer shapes
  * Catalyst aggregates can't express (e.g. sketches with internal
  * state). Partial aggregation works normally: `merge` is the
  * element-wise min of two buffers, so map-side combine still collapses
  * shingles before the shuffle.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  private val coeffs = Dedup.minHashCoeffs.toArray
  private val P = Dedup.MinHashP

  override def zero: Array[Long] = Array.fill(coeffs.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], base: Long): Array[Long] = {
    var i = 0
    while (i < coeffs.length) {
      val (a, b) = coeffs(i)
      val h = (a * base + b) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** (doc_id, h0..h{k-1}) via the typed one-pass path, column-compatible
    * with [[Dedup.minhashSignatures]].
    */
  def signatures(shingleBases: Dataset[(Long, Long)]): DataFrame = {
    val spark = shingleBases.sparkSession
    import spark.implicits._
    val agged = shingleBases
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.toColumn.name("sig"))
    agged.select(
      (col("key").as("doc_id") +:
        (0 until coeffs.length).map(i => col("sig")(i).as(s"h$i"))): _*)
  }
}
