package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries guarantees hold against exact counts — the quantitative
  * gate for q71 (which, like q14's HLL, has no cross-engine oracle). */
class MisraGriesSpec extends SparkSpec {

  private def tokenFrame = graft.Tables.documents(spark, sfDir)
    .select(explode(graft.text.TextOps.tokens(lower(col("text")))).as("tok"))

  private def checkGuarantees(k: Int, parts: Int): Unit = {
    val toks = if (parts > 0) tokenFrame.repartition(parts) else tokenFrame
    val sketch = toks.agg(MisraGries.sketch(col("tok"), k)).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = tokenFrame.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (k + 1) // integer floor is fine: error ≤ N/(k+1)
    assert(sketch.size <= k)
    sketch.foreach { case (item, est) =>
      val t = exact(item)
      assert(est <= t, s"overcount: $item est $est > true $t")
      assert(t - est <= bound, s"undercount beyond N/(k+1): $item est $est true $t bound $bound")
    }
    exact.foreach { case (item, t) =>
      if (t > bound)
        assert(sketch.contains(item), s"heavy hitter missing: $item true $t > bound $bound")
    }
  }

  test("MG bounds vs exact token counts (natural partitioning)") {
    checkGuarantees(k = 64, parts = 0)
  }

  test("MG bounds survive merging across many partitions") {
    checkGuarantees(k = 64, parts = 7)
    checkGuarantees(k = 16, parts = 13)
  }

  test("items beyond writeUTF's 65535-byte limit survive the shuffle serde") {
    import spark.implicits._
    // misra_gries is a general SQL aggregate over arbitrary STRING —
    // whole-document keys are a legitimate input. writeUTF would throw
    // UTFDataFormatException at serialize time (i.e. mid-shuffle); the
    // length-prefixed raw-UTF8 serde must round-trip them instead. Force
    // the serde with a multi-partition aggregation.
    val big = "x" * 70000 + "€" // > 65535 bytes and non-ASCII tail
    val rows = Seq.fill(5)(big) ++ Seq.fill(3)("small")
    val out = rows.toDF("item").repartition(4)
      .agg(MisraGries.sketch(col("item"), 4)).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out(big) == 5, "2 distinct items <= k: counts must be exact")
    assert(out("small") == 3)
  }

  test("buffer model: random stream, small k, bounds hold") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item i drawn with weight ~ 1/(i+1)
    val items = (1 to 5000).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min((1.0 / (r + 0.02)).toInt, 40)
      s"item$i"
    }
    val k = 8
    val buf = new MGBuffer(k)
    items.foreach { it => buf.add(it, 1L); buf.shrink() }
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = items.size.toLong / (k + 1)
    val est = {
      val m = scala.collection.mutable.Map[String, Long]()
      buf.counts.forEach((k2, v) => m(k2) = v)
      m.toMap
    }
    assert(est.size <= k)
    est.foreach { case (item, e) =>
      assert(e <= exact(item) && exact(item) - e <= bound)
    }
    exact.foreach { case (item, t) =>
      if (t > bound) assert(est.contains(item), s"missing heavy hitter $item ($t > $bound)")
    }
  }

  test("grouped sketches: per-language MG bounds hold independently") {
    val k = 32
    val perLang = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(graft.text.TextOps.tokens(lower(col("text")))).as("tok"))
      .groupBy("lang").agg(MisraGries.sketch(col("tok"), k).as("hh"))
      .collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => x.getString(0) -> x.getLong(1)).toMap
      }.toMap
    assert(perLang.size > 1, "fixture needs multiple languages")
    val exact = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(graft.text.TextOps.tokens(lower(col("text")))).as("tok"))
      .groupBy("lang", "tok").count().collect()
      .groupBy(_.getString(0)).map { case (lang, rs) =>
        lang -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    perLang.foreach { case (lang, sketch) =>
      val ex = exact(lang)
      val bound = ex.values.sum / (k + 1)
      assert(sketch.size <= k)
      sketch.foreach { case (t, est) =>
        assert(est <= ex(t) && ex(t) - est <= bound, s"$lang/$t bounds violated")
      }
      ex.foreach { case (t, n) =>
        if (n > bound) assert(sketch.contains(t), s"$lang heavy hitter $t missing")
      }
    }
  }

  test("q71 emits 20 ranked rows with positive estimates") {
    val rows = graft.text.CorpusStats.heavyHitters(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    assert(rows.forall(_.getLong(2) > 0))
    // ranks are ordered by estimate desc
    val ests = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(ests.zip(ests.tail).forall { case (a, b) => a >= b })
  }
}
