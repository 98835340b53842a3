package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramMatrixSpec extends SparkSpec {

  test("GramBuffer add/merge equals a Scala outer-product model") {
    val rnd = new scala.util.Random(42)
    val d = 5
    val rows = Seq.fill(20)(Array.fill(d)(rnd.nextInt(255).toLong - 127))
    // model: s[i][j] = sum over rows of v(i)*v(j)
    val model = Array.ofDim[Long](d, d)
    for (v <- rows; i <- 0 until d; j <- 0 until d) model(i)(j) += v(i) * v(j)
    // split rows across two buffers, merge (the map-side combine path)
    val (r1, r2) = rows.splitAt(7)
    val b1 = new GramBuffer(d); r1.foreach(b1.add)
    val b2 = new GramBuffer(d); r2.foreach(b2.add)
    b1.mergeFrom(b2)
    for (i <- 0 until d; j <- 0 until d)
      assert(b1.s(i * d + j) == model(i)(j), s"cell ($i,$j)")
    // serde round-trip preserves the state
    val agg = LongGram(org.apache.spark.sql.graftops.ColumnBridge
      .expression(col("x")), d)
    assert(agg.deserialize(agg.serialize(b1)).s.toSeq == b1.s.toSeq)
  }

  test("q98 gram matrix: symmetric, equals the unnest-self-join twin, one scan") {
    val q = graft.llm.Similarity.gramMatrix(spark, sfDir)
    val got = q.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val d = graft.llm.Similarity.EmbDim
    assert(got.size == d * d, "full d x d matrix")
    // Gram matrices are symmetric with non-negative diagonal
    for (((i, j), s) <- got) {
      assert(got((j, i)) == s, s"asymmetry at ($i,$j)")
      if (i == j) assert(s >= 0, s"negative diagonal at $i")
    }
    // declarative twin: explode the quantized vectors, self-join, agg
    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("mx", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("qv",
        when(col("mx") === 0.0, transform(col("embedding"), _ => lit(0L)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("mx") * 127.0).cast("long"))))
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("i", "v")))
    val twin = e.as("a").join(e.as("b"), "vec_id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == twin, "aggregate must equal the declarative self-join twin")
    // one embeddings scan; the d^2 blowup never crosses an exchange
    val scans = allPlanNodes(executedPlanOf(q)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.size == 1, s"expected one embeddings scan, got ${scans.size}")
  }
}
