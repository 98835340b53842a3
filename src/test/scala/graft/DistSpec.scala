package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistSpec extends SparkSpec {

  test("globalRowNumber matches the single-partition window row_number") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
      .repartition(7) // scramble the layout first
    val got = Dist.globalRowNumber(docs, col("doc_id"), numParts = 5)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = Tables.documents(spark, sfDir).select(col("doc_id"))
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))).cast("long"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ref)
  }

  test("saltedJoin equals the plain equi-join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val salted = Dist.saltedJoin(li, o, Seq("l_orderkey"),
        xxhash64(col("l_linenumber")), factor = 8)
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(salted == plain)
  }

  test("globalRowNumber is dense 1..N") {
    val n = 123
    import spark.implicits._
    val df = (1 to n).map(i => i * 10L).toDF("k").repartition(4)
    val rns = Dist.globalRowNumber(df, col("k"), numParts = 4)
      .select("rn").collect().map(_.getLong(0)).sorted.toSeq
    assert(rns == (1L to n.toLong))
  }
}
