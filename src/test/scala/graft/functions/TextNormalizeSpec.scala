package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextNormalizeSpec extends SparkSpec {

  test("NFC: composed and decomposed spellings fingerprint identically") {
    import spark.implicits._
    val composed = "Café résumé"          // é as U+00E9
    val decomposed = "Café résumé"      // e + U+0301
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
      .select(col("id"), TextNormalize.nfc(col("t")).as("n"),
        md5(TextNormalize.nfc(col("t"))).as("fp"))
    val rows = df.collect()
    assert(rows(0).getString(1) == rows(1).getString(1),
      "NFC must unify composition variants")
    assert(rows(0).getString(1) == composed, "NFC canonical form is the composed one")
    assert(rows(0).getString(2) == rows(1).getString(2))
  }

  test("NFC is idempotent and identity on ASCII") {
    import spark.implicits._
    val cases = Seq("plain ascii text", "tabs\tand\nnewlines", "",
      "mixed ascii café ascii", "ǟ stacked marks")
    val df = cases.toDF("t").select(
      TextNormalize.nfc(col("t")).as("once"),
      TextNormalize.nfc(TextNormalize.nfc(col("t"))).as("twice"), col("t"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), "NFC must be idempotent")
      if (r.getString(2).forall(_ < 128))
        assert(r.getString(0) == r.getString(2), "ASCII must pass through unchanged")
    }
  }

  test("nfc matches java.text.Normalizer on random unicode strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // mix ASCII, latin letters, combining marks and a few surrogates
    val pool = ('a' to 'z') ++ Seq('é', '́', '̈', 'Å', 'Å', '中')
    val cases = (1 to 100).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.size))).mkString)
    val got = cases.toDF("t").select(TextNormalize.nfc(col("t")))
      .collect().map(_.getString(0)).toSeq
    val expected = cases.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got == expected)
  }

  test("null input yields null; SQL-callable as nfc()") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextNormalize.nfc(col("t"))).collect().head
    assert(r.isNullAt(0))
  }
}
