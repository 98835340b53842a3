package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Decimal, DecimalType}

class TopKSpec extends SparkSpec {

  test("decimalTopK keeps (score desc, id asc) order, ties break on id") {
    import spark.implicits._
    val df = Seq(
      ("g1", "5.00", 10L), ("g1", "5.00", 3L), ("g1", "7.25", 9L),
      ("g1", "1.00", 1L), ("g1", "7.25", 2L),
      ("g2", "2.00", 5L)) // under-k group: 1 row → 1 entry
      .toDF("g", "s", "id")
      .select(col("g"), col("s").cast(DecimalType(14, 4)).as("s"), col("id"))
      // spread across partitions so partial buffers actually merge (and
      // serialize) across the exchange
      .repartition(4, col("id"))
    val out = df.groupBy(col("g"))
      .agg(TopK.decimalTopK(col("s"), col("id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.score").cast("string"), col("col.id"))
      .orderBy(col("g"), col("pos"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("g1", 0, "7.2500", 2L),  // tie on 7.25 → lower id first
      ("g1", 1, "7.2500", 9L),
      ("g1", 2, "5.0000", 3L),  // tie on 5.00 → id 3 beats 10; 1.00 evicted
      ("g2", 0, "2.0000", 5L)))
  }

  test("TopKBuffer insert/merge/eviction invariants") {
    def d(s: String) = Decimal(new java.math.BigDecimal(s), 14, 4)
    val a = new TopKBuffer(3)
    Seq(("1.0", 1L), ("9.0", 2L), ("5.0", 3L), ("7.0", 4L), ("9.0", 0L))
      .foreach { case (s, id) => a.insert(d(s), id) }
    assert((0 until a.n).map(i => (a.scores(i).toString, a.ids(i))) ==
      Seq(("9.0000", 0L), ("9.0000", 2L), ("7.0000", 4L)))
    val b = new TopKBuffer(3)
    b.insert(d("8.0"), 7L)
    b.mergeFrom(a)
    assert((0 until b.n).map(i => (b.scores(i).toString, b.ids(i))) ==
      Seq(("9.0000", 0L), ("9.0000", 2L), ("8.0000", 7L)))
  }
}
