package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Extensions are fixed at session build time, so this spec builds its own
  * session (sharing the JVM's SparkContext). It must NOT stop() it — that
  * would stop the SparkContext shared with the other suites' session —
  * and it restores the previous default/active session afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("kernels are callable from SQL text via SparkSessionExtensions") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", 2)
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = spark.sql(
        """SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS k,
          |       dot_long(array(1L, 2L), array(10L, 20L)) AS d,
          |       minhash_sig(array(7L)) AS sig,
          |       simhash60(array(7L)) AS sh""".stripMargin)
        .collect().head
      assert(row.getLong(0) == 2L)
      assert(row.getLong(1) == 50L)
      val sig = row.getSeq[Long](2)
      assert(sig == (0 until graft.llm.Similarity.NumPerms).map(i =>
        (graft.llm.Similarity.permA(i) * 7L + graft.llm.Similarity.permB(i)) % graft.llm.Similarity.P))
      assert(row.getLong(3) == 7L)
      // custom AGGREGATES resolve from SQL text too
      val agg = spark.sql(
        """SELECT misra_gries(w, 4) AS hh,
          |       decimal_top_k(CAST(v AS DECIMAL(10,2)), id, 2) AS tk,
          |       dot_int8(array(CAST(2 AS TINYINT)), array(CAST(3 AS TINYINT))) AS d8
          |FROM VALUES ('a', 1.0, 1L), ('a', 2.0, 2L), ('b', 3.0, 3L) AS t(w, v, id)""".stripMargin)
        .collect().head
      val hh = agg.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hh == Map("a" -> 2L, "b" -> 1L))
      val tk = agg.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))
      assert(tk == Seq(3L, 2L), s"top-2 by score desc: got $tk")
      assert(agg.getLong(2) == 6L)
    } finally {
      prev.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
