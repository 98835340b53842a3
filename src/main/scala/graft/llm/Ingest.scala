package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q233: the INCREMENTAL daily-ingest gate — the composition q218 cannot
  * model. q218 self-screens one rendered corpus; production ingests
  * batch N against the LANDED corpus of batches 1..N−1, and its cost
  * must be ∝ |batch|, never ∝ |corpus|. The reference's own recurring
  * workflow is the degenerate single-folder form of this (re-run the
  * same job over a folder that grew — `/root/reference/modules/utils
  * .py:11-16` precondition + re-run pattern); at 100 TB the corpus side
  * must instead be LANDED state that each batch probes.
  *
  * The composition, in precedence order (first match wins — an exact
  * dup is also a near dup is usually also contained; the gate pins the
  * ordering exactly because single-stage gates cannot):
  *
  *  1. `dup_url` — the batch doc's canonical URL was already fetched by
  *     the landed corpus (frontier anti-join; fixture: docs with
  *     (doc_id div 10) % 3 == 1 re-discover the URL of corpus doc
  *     doc_id − 4, everyone else carries a fresh URL);
  *  2. `exact_dup` — the batch text occurs verbatim in the landed
  *     corpus (q68's exact probe);
  *  3. `near_dup` — a verified MinHash match (Jaccard ≥ 0.9) exists in
  *     the corpus (q68/q87's banded probe against the LANDED band
  *     table);
  *  4. `contained` — ≥ 90% of the batch doc's word-3-GRAM shingles
  *     (q178's granularity — unigram sets would make containment a
  *     catch-all on any shared-vocabulary corpus) occur inside one
  *     corpus doc with 10·|c| ≥ 9·|i| (q178's prefix-filtered
  *     containment probe, run against LANDED postings);
  *  5. `ingested` — novel; enters the corpus.
  *
  * Batch = the `doc_id % 10 == 7` slice (q68/q178's convention), corpus
  * = the rest. Two planted transforms make the exact and containment
  * classes fire under the precedence (r11 ADVICE: the corpus fixture has
  * no natural verbatim dups across the %10 boundary, so without a plant
  * the exact screen passes vacuously): batch docs with
  * (doc_id div 10) % 5 == 4 ingest corpus doc (doc_id−3)'s text VERBATIM
  * — dup_url claims the div10%3==1 overlap, the rest land exact_dup —
  * and batch docs with (doc_id div 10) % 5 == 2 ingest the FIRST HALF of corpus doc
  * (doc_id−3)'s text — a snippet, the real-world contained case (a
  * quote/excerpt page): its 3-grams are 100% inside the anchor, while
  * its distinct-WORD Jaccard vs the anchor averages ~0.67 on this
  * corpus (measured at sf0.01), below the 0.9 near-dup bar — snippets
  * whose word sets DO reach 0.9 stay near_dup by precedence, on both
  * engines. Missing anchors (id-sparse strided corpora — the q218
  * lesson) fall back to the doc's own text, on both engines. Output:
  * one row per status with the count and an
  * order-independent bit_xor fingerprint of the batch doc_ids — a wrong
  * screen, a wrong precedence, or a lost/duplicated doc moves a count
  * or a fingerprint.
  *
  * 100 TB shape (the work-∝-batch contract, plan-asserted in
  * IngestSpec): the corpus side lives in FOUR bucketed catalog tables
  * landed once ([[graft.io.Layout.ensureBucketed]] — signatures on
  * doc_id, band keys on bkey, postings and document frequencies on h;
  * the q87 discipline extended to the containment tier). Every probe
  * BROADCASTS batch-derived frames past corpus-table SCANS:
  *  - URL probe: corpus canonicals stream past the broadcast batch
  *    canonical set; the ≤|batch| seen set broadcasts back (q68's
  *    matchedTexts inversion — the corpus is never a build side);
  *  - exact probe: same inversion on md5(text) digests;
  *  - near-dup probe: landed band table streams past broadcast batch
  *    band keys; slim candidates broadcast into the landed signature
  *    stream; batch shingle arrays attach by broadcast (q87's shape);
  *  - containment probe: batch tokens probe the landed dfreq table for
  *    rarity ranks (batch-side explode broadcasts), the pigeonhole
  *    prefix (the sz_i − ⌈0.9·sz_i⌉ + 1 RAREST tokens — exact by
  *    pigeonhole whatever the ordering) probes the landed postings
  *    stream, and the verify reuses the near-dup candidate machinery.
  * No corpus row enters a shuffle or a broadcast; every corpus-table
  * read is a scan streaming past batch-bounded build sides. The census
  * is one ≤5-row aggregate.
  */
object Ingest {

  import Similarity.{hashedShingles, bandKeysFor, gram3Hashed, tokens, hash60, P}

  private def landedSuffix(dir: String): String = graft.io.Layout.dirSuffix(dir)

  /** Fixture URL scheme: corpus docs carry their own per-doc URL; the
    * planted BATCH re-discovery class ((doc_id div 10) % 3 == 1) carries
    * the URL of corpus doc doc_id−4 instead — (doc_id−4) % 10 == 3, so
    * the anchor is always corpus-side and keeps its own URL. The div-10
    * term derives from the PASSED column (not a hard-coded name), so a
    * caller probing a renamed/derived id column keeps the plant; exact
    * for any id below 2^53 (id domains are bounded by Scaling.Stride ×
    * copies, far under that). */
  private def canonOf(id: org.apache.spark.sql.Column) = {
    val rediscover = pmod(id, lit(10)) === 7 &&
      pmod(floor(id / lit(10)).cast("long"), lit(3)) === 1
    concat(lit("https://crawl.example.com/d/"),
      when(rediscover, id - 4).otherwise(id).cast("string"))
  }

  def incrementalIngest(spark: SparkSession, dir: String): DataFrame = {
    val suffix = landedSuffix(dir)
    val sigsT = s"graft_corpus_sigs_$suffix"   // shared with q87
    val bandsT = s"graft_corpus_bands_$suffix" // shared with q87
    val postT = s"graft_corpus_post_$suffix"
    val dfreqT = s"graft_corpus_dfreq_$suffix"
    val isBatch = pmod(col("doc_id"), lit(10)) === 7
    // ---- one-time landing (the untimed deployment step; q87 lands the
    // first two via the SAME shared builder — the fingerprint keys on
    // source files, so the builds must be identical — q233 adds the
    // containment tier's postings + dfreq)
    Similarity.landCorpusSigs(spark, dir, sigsT, bandsT)
    // postings derive from the ALREADY-LANDED sigs table, not a second
    // raw-parquet scan (r12 judge task 1): the bucketed layout reads 16
    // parallel bucket files where the single-row-group harness parquet
    // planned ONE scan task (the old path paid a fanOut exchange to fix
    // that), and the gram hashing itself is now the fused
    // wordGram3Hash60 kernel — together they cut the landing from
    // 29.5 s to ~7 s at sf0.1 (255 s at sf1 was ~60% of a sweep).
    graft.io.Layout.ensureBucketed(spark, postT, "h", 16)(
      spark.table(sigsT)
        .select(col("doc_id").as("cor_id"),
          gram3Hashed(tokens(col("text"))).as("g3"))
        .select(col("cor_id"), size(col("g3")).cast("long").as("sz_c"),
          explode(col("g3")).as("h")))
    graft.io.Layout.ensureBucketed(spark, dfreqT, "h", 16)(
      spark.table(postT).groupBy(col("h")).agg(count(lit(1)).as("df")))
    val corSigs = spark.table(sigsT)
    val corBands = spark.table(bandsT)
    val corPost = spark.table(postT)
    val corDfreq = spark.table(dfreqT)
    // ---- the recurring path: only the batch is hashed fresh. The
    // snippet plant's anchor texts are fetched work-∝-batch: the corpus
    // scan streams past the BROADCAST batch anchor-id set (≤|batch|
    // rows out), never the reverse.
    // fanOut: the batch slice hashes word shingles AND 3-grams per row
    // from the one-task scan (sf0.1: 4.7 -> ~3.3 s; sf1 8.7 s = 2.7x)
    val aidOf =
      when(pmod(expr("doc_id div 10"), lit(5)).isin(2, 4), col("doc_id") - 3)
    val rawBatch = graft.Dist.fanOut(Tables.documents(spark, dir)).filter(isBatch)
      .select(col("doc_id"), col("text"), aidOf.as("aid"))
    // anchor-id broadcast from a SLIM direct scan (doc_id only, no fanOut
    // exchange — the heavy hashing path keeps it, this branch doesn't),
    // and the anchor texts from the 16-bucket landed sigs table instead
    // of the single-row-group raw parquet: same rows (the sigs table IS
    // documents filtered to the corpus slice), one less exchange on the
    // batch checkpoint's critical path, and a parallel anchor scan.
    val batchAids = Tables.documents(spark, dir).filter(isBatch)
      .select(aidOf.as("aid")).filter(col("aid").isNotNull)
    val anchorTexts = spark.table(sigsT)
      .select(col("doc_id").as("aid"), col("text").as("atext"))
      .join(broadcast(batchAids), Seq("aid"), "left_semi")
    // div10%5==4: VERBATIM copy of the anchor (the planted exact_dup
    // class — r11 ADVICE: without it the exact screen passed vacuously
    // with 0 rows on both engines); div10%5==2: the first-half snippet
    // (the contained class). Missing anchors fall back to own text.
    val ingestText = when(col("atext").isNotNull &&
        pmod(expr("doc_id div 10"), lit(5)) === 4, col("atext"))
      .when(col("atext").isNotNull,
        expr("substr(atext, 1, length(atext) div 2)")).otherwise(col("text"))
    val batch = rawBatch
      .join(broadcast(anchorTexts), Seq("aid"), "left")
      .select(col("doc_id"), canonOf(col("doc_id")).as("canon"),
        md5(ingestText).as("th"), hashedShingles(ingestText).as("hs"),
        gram3Hashed(tokens(ingestText)).as("g3"))
      .withColumn("sz_i", size(col("g3")).cast("long"))
      .transform(graft.Dist.durableCkpt)
    // ---- 1. URL probe (corpus canonicals stream past broadcast batch)
    val corCanon = Tables.documents(spark, dir).filter(!isBatch)
      .select(canonOf(col("doc_id")).as("canon"))
    val seenCanon = corCanon
      .join(broadcast(batch.select(col("canon"))), Seq("canon"), "left_semi")
      .distinct()
    val urlIds = batch.select(col("doc_id"), col("canon"))
      .join(broadcast(seenCanon), Seq("canon"), "left_semi")
      .select(col("doc_id"))
    // ---- 2. exact probe (q68's inversion, on slim digests — the digest
    // is LANDED in the sigs table, so the scan prunes to the th column
    // instead of re-hashing every corpus text per run)
    val seenTexts = corSigs.select(col("th"))
      .join(broadcast(batch.select(col("th"))), Seq("th"), "left_semi")
      .distinct()
    val exactIds = batch.select(col("doc_id"), col("th"))
      .join(broadcast(seenTexts), Seq("th"), "left_semi")
      .select(col("doc_id"))
    // ---- 3. near-dup probe (q87's landed-band shape)
    val cand = corBands.withColumnRenamed("doc_id", "cor_id")
      .join(broadcast(bandKeysFor(batch.select(col("doc_id"), col("hs")), "doc_id")
        .withColumnRenamed("doc_id", "inc_id")), Seq("bkey"))
      .select(col("inc_id"), col("cor_id"))
    val nearRaw = corSigs.select(col("doc_id").as("cor_id"), col("hs").as("hs_c"))
      .join(broadcast(cand), Seq("cor_id"))
      .join(broadcast(batch.select(col("doc_id").as("inc_id"), col("hs").as("hs_i"))),
        Seq("inc_id"))
      .withColumn("szi", size(col("hs_i"))).withColumn("szc", size(col("hs_c")))
      .filter(least(col("szi"), col("szc")) * 10 >= greatest(col("szi"), col("szc")) * 9)
      .withColumn("n_shared",
        graft.functions.ArrayKernels.sortedIntersectCount(col("hs_i"), col("hs_c")))
      .filter(col("n_shared") / (col("szi") + col("szc") - col("n_shared")) >= 0.9)
      .select(col("inc_id").as("doc_id"))
    val nearIds = batch.select(col("doc_id"))
      .join(broadcast(nearRaw), Seq("doc_id"), "left_semi")
    // ---- 4. containment probe (q178's prefix filter against the
    // landed postings; prefix = the sz_i − ⌈0.9·sz_i⌉ + 1 rarest tokens)
    val batchToks = batch.filter(col("sz_i") > 0)
      .select(col("doc_id").as("inc_id"), col("sz_i"), explode(col("g3")).as("h"))
    val ranked = corDfreq
      .join(broadcast(batchToks), Seq("h"))
      .select(col("inc_id"), col("sz_i"), col("h"), col("df"))
      // unseen tokens (df null-free here: inner join drops them) rank
      // AFTER seen ones only if re-added; a token absent from the corpus
      // can never witness containment, so dropping it from the prefix
      // POOL is safe only when enough seen tokens remain — re-attach
      // unseen tokens with df = 0 via the left join below instead.
    val rankedAll = batchToks
      .join(broadcast(ranked.select(col("inc_id").as("i2"), col("h").as("h2"),
        col("df"))), col("inc_id") === col("i2") && col("h") === col("h2"), "left")
      .select(col("inc_id"), col("sz_i"), col("h"),
        coalesce(col("df"), lit(0L)).as("df"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("inc_id"))
          .orderBy(col("df"), col("h"))))
      .filter(col("rn") <= col("sz_i") - expr("(9 * sz_i + 9) div 10") + 1)
      .select(col("inc_id"), col("h"))
    val contCand = corPost
      .join(broadcast(rankedAll), Seq("h"))
      .select(col("inc_id"), col("cor_id")).distinct()
    // verify WITHOUT corpus-side arrays: the landed postings stream past
    // broadcast batch probes — n_shared is a count over matching
    // (cor_id, h) posting rows, sz_c rides on the posting row itself, so
    // no corpus g3 array is ever materialized (the g3 arrays exist only
    // batch-side). Fused to ONE postings pass (r14): the old shape
    // materialized an intermediate (candidate × batch-token) broadcast
    // — one more blocking build on the chain's critical path. Now the
    // postings stream probes three batch-bounded builds inside a single
    // codegen stage: a cor_id semi (bounds the h-join fan-out to
    // candidate docs before it happens), the batch tokens on h, and the
    // candidate PAIR semi that restores exactly the old row set.
    val contRaw = corPost
      // no distinct on the cor_id slice: a semi-join build side dedups
      // keys inherently, and a distinct would add an exchange round
      .join(broadcast(contCand.select(col("cor_id"))), Seq("cor_id"), "left_semi")
      .join(broadcast(batchToks), Seq("h"))
      .join(broadcast(contCand), Seq("inc_id", "cor_id"), "left_semi")
      .filter(lit(10) * col("sz_c") >= lit(9) * col("sz_i"))
      .groupBy(col("inc_id"), col("cor_id"), col("sz_i"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(lit(10) * col("n_shared") >= lit(9) * col("sz_i"))
      .select(col("inc_id").as("doc_id"))
    val contIds = batch.select(col("doc_id"))
      .join(broadcast(contRaw), Seq("doc_id"), "left_semi")
    // ---- census with precedence (each batch doc exactly once)
    val flags = batch.select(col("doc_id"))
      .join(broadcast(urlIds.withColumn("u", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(exactIds.withColumn("e", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(nearIds.withColumn("n", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(contIds.withColumn("c", lit(true))), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("u"), "dup_url").when(col("e"), "exact_dup")
          .when(col("n"), "near_dup").when(col("c"), "contained")
          .otherwise("ingested").as("status"))
    flags.select(col("status"), hash60(col("doc_id").cast("string")).as("fp"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(fp)").cast("long").as("id_fp"))
      // ≤5 rows: a single-partition sort, not a range exchange (whose
      // boundary sampling re-runs the census stage)
      .repartition(1).sortWithinPartitions(col("status"))
  }

  /** Oracle: every stage recomputed directly — URL arithmetic, exact
    * EXISTS, the q68 banded near check, the q178 brute-force containment
    * check (prefix filtering is an exact optimization by pigeonhole, so
    * the oracle skips it) — with the same first-match precedence. */
  val incrementalIngestSql: String =
    s"""WITH ab AS (
       |  SELECT b.doc_id,
       |    CASE WHEN a.text IS NOT NULL AND (b.doc_id // 10) % 5 = 4
       |         THEN a.text
       |         WHEN a.text IS NOT NULL
       |         THEN substr(a.text, 1, length(a.text) // 2)
       |         ELSE b.text END AS text
       |  FROM documents b LEFT JOIN documents a
       |    ON a.doc_id = b.doc_id - 3 AND a.doc_id % 10 <> 7
       |       AND (b.doc_id // 10) % 5 IN (2, 4)
       |  WHERE b.doc_id % 10 = 7
       |), base AS MATERIALIZED (
       |  SELECT doc_id, text FROM ab
       |  UNION ALL
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7
       |), sh AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''),
       |      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % $P)) AS hs
       |  FROM base
       |), th AS (
       |  SELECT doc_id, unnest(hs) AS h FROM sh
       |), perms(i, a, b) AS (VALUES ${Similarity.permRowsSql}),
       |sigs AS (
       |  SELECT doc_id, i, MIN((a * h + b) % $P) AS sig
       |  FROM th CROSS JOIN perms GROUP BY doc_id, i
       |),
       |u AS (
       |  SELECT doc_id,
       |    'https://crawl.example.com/d/' ||
       |    CAST(CASE WHEN doc_id % 10 = 7 AND (doc_id // 10) % 3 = 1
       |              THEN doc_id - 4 ELSE doc_id END AS VARCHAR) AS canon
       |  FROM documents
       |), url_ids AS (
       |  SELECT b.doc_id FROM u b WHERE b.doc_id % 10 = 7 AND EXISTS (
       |    SELECT 1 FROM u c WHERE c.doc_id % 10 <> 7 AND c.canon = b.canon)
       |), exact_ids AS (
       |  SELECT d.doc_id FROM base d
       |  WHERE d.doc_id % 10 = 7 AND EXISTS (
       |    SELECT 1 FROM base c WHERE c.doc_id % 10 <> 7 AND c.text = d.text)
       |), bands AS (
       |  SELECT doc_id, i // ${Similarity.RowsPerBand} AS band,
       |    list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // ${Similarity.RowsPerBand}
       |), cand AS (
       |  SELECT DISTINCT i.doc_id AS inc_id, c.doc_id AS cor_id
       |  FROM bands i JOIN bands c ON i.band = c.band AND i.bsig = c.bsig
       |  WHERE i.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
       |), near_ids AS (
       |  SELECT DISTINCT inc_id AS doc_id FROM cand
       |  JOIN sh sa ON sa.doc_id = inc_id JOIN sh sb ON sb.doc_id = cor_id
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM base
       |), g3 AS MATERIALIZED (
       |  SELECT doc_id, list_sort(list_distinct(
       |    [CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15)) AS BIGINT) % $P
       |     for i in range(1, len(t) - 1)])) AS g
       |  FROM toks WHERE len(t) >= 3
       |), cont_ids AS (
       |  SELECT DISTINCT i.doc_id FROM g3 i JOIN g3 c
       |    ON c.doc_id % 10 <> 7 AND 10 * len(c.g) >= 9 * len(i.g)
       |  WHERE i.doc_id % 10 = 7 AND len(i.g) > 0
       |    AND 10 * len(list_intersect(i.g, c.g)) >= 9 * len(i.g)
       |), verd AS (
       |  SELECT d.doc_id,
       |    CASE WHEN d.doc_id IN (SELECT doc_id FROM url_ids) THEN 'dup_url'
       |         WHEN d.doc_id IN (SELECT doc_id FROM exact_ids) THEN 'exact_dup'
       |         WHEN d.doc_id IN (SELECT doc_id FROM near_ids) THEN 'near_dup'
       |         WHEN d.doc_id IN (SELECT doc_id FROM cont_ids) THEN 'contained'
       |         ELSE 'ingested' END AS status
       |  FROM documents d WHERE d.doc_id % 10 = 7
       |)
       |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(bit_xor(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
       |    AS BIGINT)) AS BIGINT) AS id_fp
       |FROM verd GROUP BY status ORDER BY status""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q233_incremental_ingest", incrementalIngest,
      Some(incrementalIngestSql)))
}
