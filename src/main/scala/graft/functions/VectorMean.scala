package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [[VectorCentroid]]'s `Array[Double]` sibling: element-wise mean of
  * double vectors, used where the input is a DERIVED vector (v25's
  * per-coordinate product rows x_i·x — already double after the cast)
  * rather than a raw float embedding. Same buffer algebra —
  * `(sums, count)`, associative and commutative — so Spark runs it as
  * a partial (map-side) aggregate and the shuffle carries one
  * d-double buffer per (group × partition) instead of the row mass.
  * That property is the whole 100 TB story for second-moment
  * accumulation: the covariance pass shuffles d buffers of d doubles,
  * never the corpus. */
class VectorMean extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    if (v == null) return b
    val sums = if (b._2 == 0L) new Array[Double](v.length) else b._1
    require(sums.length == v.length,
      s"vector dimension mismatch: ${sums.length} vs ${v.length}")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1L)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) return b
    if (b._2 == 0L) return a
    require(a._1.length == b._1.length,
      s"vector dimension mismatch: ${a._1.length} vs ${b._1.length}")
    val sums = a._1.clone()
    var i = 0
    while (i < sums.length) { sums(i) += b._1(i); i += 1 }
    (sums, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray
    else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
