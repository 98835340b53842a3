package graft.text

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q227: Unicode normalization hygiene — the corpus-cleaning stage
  * beside mojibake repair (q180). Real crawl text mixes NFC and NFD
  * spellings of the same words (macOS filenames and some CMSes emit
  * decomposed forms) and carries invisible default-ignorable characters
  * (zero-width space/joiner/non-joiner, BOM-as-ZWNBSP). Both break
  * exact dedup, tokenization and contamination screens: "café" ≠
  * "café" byte-wise though canonically equal [Unicode Standard
  * Annex #15, Normalization Forms; every serious pipeline normalizes
  * to NFC and strips zero-widths before hashing].
  *
  * Documented repair contract: strip U+200B/U+200C/U+200D/U+FEFF, then
  * normalize to NFC (`java.text.Normalizer`). The audit detects the two
  * damage classes independently (non-NFC sequences; zero-width
  * presence), repairs, and proves IN-ENGINE that every repaired doc
  * equals its clean twin (`n_repair_ok`), with a fingerprint over the
  * repaired BYTES so the gate certifies the text, not just counts.
  *
  * Ground truth by construction (q180's discipline): the harness corpus
  * is clean ASCII, so the query plants an accented suffix on every doc —
  * composed (clean control) on most, DECOMPOSED (NFD) on one residue
  * class, zero-width-infested on another — and the oracle builds the
  * repaired corpus directly from the composed literal. The gate thus
  * also pins the JVM normalizer against the composed spelling exactly
  * (an ICU/JDK divergence on these stable Latin sequences would break
  * the hash).
  *
  * Scale shape: pure per-row kernel + one census aggregate; repaired
  * text never shuffles (only its md5 rides into the sum). */
object UnicodeNorm {

  private val P = 1000000007L

  /** Composed (NFC) suffix — the clean twin every doc must repair to. */
  private[text] val SufNFC = " caf\u00e9 se\u00f1or na\u00efve"

  /** The same text in decomposed (NFD) spelling: base letters plus
    * combining acute / tilde / diaeresis. */
  private[text] val SufNFD = " cafe\u0301 sen\u0303or nai\u0308ve"

  /** The composed text with zero-width characters injected: ZWNBSP/BOM
    * lead, ZWSP / ZWNJ / ZWJ between and inside words. */
  private[text] val SufZW =
    "\ufeff caf\u00e9\u200b se\u00f1or\u200c na\u00ef\u200dve"

  private val ZwChars =
    Set('\u200b', '\u200c', '\u200d', '\ufeff')

  /** The repair kernel: (non_nfc_detected, zw_detected, repaired). */
  private[text] def repair(s: String): (Boolean, Boolean, String) = {
    val zw = s.exists(ZwChars)
    val nonNfc = !java.text.Normalizer.isNormalized(
      s, java.text.Normalizer.Form.NFC)
    val stripped = if (zw) s.filterNot(ZwChars) else s
    val rep =
      if (java.text.Normalizer.isNormalized(stripped, java.text.Normalizer.Form.NFC))
        stripped
      else java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
    (nonNfc, zw, rep)
  }

  private val repairUdf = udf { (s: String) => repair(s) }

  def unicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val m = pmod(col("doc_id"), lit(5))
    val planted = concat(col("text"),
      when(m === 1, lit(SufNFD)).when(m === 3, lit(SufZW))
        .otherwise(lit(SufNFC)))
    docs
      .select(col("source"), col("text"), repairUdf(planted).as("r"))
      .select(col("source"),
        col("r._1").as("non_nfc"), col("r._2").as("zw"),
        (col("r._3") === concat(col("text"), lit(SufNFC))).as("ok"),
        md5(col("r._3")).as("rep_md5"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("non_nfc"), 1L).otherwise(0L)).as("n_nonnfc"),
        sum(when(col("zw"), 1L).otherwise(0L)).as("n_zw"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_repair_ok"),
        pmod(sum(pmod(conv(substring(col("rep_md5"), 1, 15), 16, 10)
          .cast("long"), lit(P))), lit(P)).as("fp_sum"))
      .orderBy(col("source"))
  }

  /** Oracle: the repaired corpus built directly from the composed
    * literal; damage counts from the residue classes. */
  val unicodeNormalizeSql: String =
    s"""WITH r AS (
       |  SELECT source, doc_id % 5 AS m, text || '$SufNFC' AS rep
       |  FROM documents
       |)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonnfc,
       |  CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_zw,
       |  CAST(COUNT(*) AS BIGINT) AS n_repair_ok,
       |  CAST(SUM(CAST(concat('0x', substr(md5(rep), 1, 15)) AS BIGINT) % $P)
       |    % $P AS BIGINT) AS fp_sum
       |FROM r GROUP BY source ORDER BY source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q227_unicode_normalize", unicodeNormalize, Some(unicodeNormalizeSql)))
}
