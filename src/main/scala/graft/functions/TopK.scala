package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY §2.12 top-k, the scale
  * path): keeps a k-element buffer per group, merged map-side, so a
  * group's top-3 never sorts — or even shuffles — more than k rows per
  * partition. The window form (`row_number().over(partitionBy(g).orderBy
  * (score))`) sorts EVERY group member through the exchange; this carries
  * k·partitions rows. For k=3 over millions of members per group that is
  * the difference between a straggler and a no-op.
  *
  * Scores are BigDecimal so ordering matches the exact-decimal revenue
  * aggregates (double collisions could permute near-equal ranks vs the
  * oracle). Ties break on the ascending id — same total order as the
  * window/oracle formulation.
  */
class TopKByScore(k: Int)
    extends Aggregator[(java.math.BigDecimal, Long), List[(java.math.BigDecimal, Long)], Seq[(java.math.BigDecimal, Long)]]
    with Serializable {

  private def lt(a: (java.math.BigDecimal, Long), b: (java.math.BigDecimal, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c > 0 || (c == 0 && a._2 < b._2) // score desc, id asc
  }

  override def zero: List[(java.math.BigDecimal, Long)] = Nil

  override def reduce(buf: List[(java.math.BigDecimal, Long)],
                      row: (java.math.BigDecimal, Long)): List[(java.math.BigDecimal, Long)] =
    insert(buf, row)

  override def merge(a: List[(java.math.BigDecimal, Long)],
                     b: List[(java.math.BigDecimal, Long)]): List[(java.math.BigDecimal, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(java.math.BigDecimal, Long)],
                     row: (java.math.BigDecimal, Long)): List[(java.math.BigDecimal, Long)] = {
    val (better, worse) = buf.span(lt(_, row))
    (better ::: row :: worse).take(k)
  }

  override def finish(buf: List[(java.math.BigDecimal, Long)]): Seq[(java.math.BigDecimal, Long)] = buf

  override def bufferEncoder: Encoder[List[(java.math.BigDecimal, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(java.math.BigDecimal, Long)]] =
    ExpressionEncoder()
}
