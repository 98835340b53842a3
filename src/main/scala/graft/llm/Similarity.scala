package graft.llm

import graft.{Dist, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data-pipeline operators the reference lacks but a 100 TB corpus
  * needs: near-duplicate detection (MinHash+LSH, SimHash, n-gram Jaccard)
  * and similarity search over embeddings (brute-force cosine; hyperplane-LSH
  * ANN as the scale path). Generalizes the reference's exact line dedup
  * (`/root/reference/modules/other_tasks.py:100-125`) to fuzzy matching.
  *
  * Cross-engine determinism (every query here is DuckDB-oracle-checked):
  *  - the base string hash is the first 15 hex chars of md5 → a 60-bit
  *    non-negative long; both engines compute identical md5, so identical
  *    hashes (no reliance on engine-specific hash functions);
  *  - float embeddings are quantized `floor(x * 2^20)` — double widening and
  *    power-of-two scaling are exact in IEEE754, so all dot products and
  *    norms are *integer* arithmetic, order-independent and engine-identical;
  *    the final cosine (int / sqrt·sqrt) is correctly-rounded IEEE double in
  *    both engines;
  *  - MinHash permutation constants come from one fixed LCG, inlined into
  *    both the Spark plan and the oracle SQL from the same Scala arrays.
  *
  * Scale design (local[32] now, 1000 executors later):
  *  - signatures/shingles are computed with array expressions inside
  *    whole-stage codegen — NO explode/shuffle until the LSH band self-join;
  *  - the only wide ops are the band-key shuffle (keys ~uniform: 60-bit
  *    hashes) and the candidate-pair verify join, both equi-joins AQE can
  *    re-plan; identical-text mega-clusters are the classic skew risk —
  *    mitigate upstream with exact-dedup first (q20), which collapses each
  *    cluster to one representative;
  *  - brute-force cosine broadcasts the (small) probe set; the LSH variant
  *    replaces the cross join with a bucket equi-join, which is the shape
  *    that survives 100 TB (bucket count scales with plane count).
  */
object Similarity {

  // ---------------------------------------------------------------- hashing

  /** 60-bit base hash: first 15 hex chars of md5, identical in DuckDB via
    * CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT). Computed by the
    * compiled kernel (digest bytes → top 60 bits; r13) — the expression
    * chain below allocated a MessageDigest, a 32-char hex string, a
    * 15-char substring and a base-16 parse PER CALL, and hash60 runs on
    * every census fingerprint and text-sized manifest key in the suite.
    * Bit-identity vs [[hash60Hof]] is spec-locked (SketchKernelsSpec). */
  def hash60(c: Column): Column = graft.functions.SketchKernels.hash60(c)

  /** The pre-kernel expression form — the semantic definition the kernel
    * must match; kept for the bit-identity regression spec. */
  def hash60Hof(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  val P: Long = 2147483647L // 2^31-1, prime; minhash value domain

  /** Fixed-LCG permutation constants (a_i odd-ish in [1,P), b_i in [0,P)). */
  val NumPerms = 64
  val permA: Array[Long] = {
    var x = 1234567891L
    Array.fill(NumPerms) { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x % (P - 1) + 1 }
  }
  val permB: Array[Long] = {
    var x = 9876543211L
    Array.fill(NumPerms) { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x % P }
  }

  /** Whitespace tokens of lowercased text, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= lit(""))

  /** Distinct unigram shingle set (the corpus's discriminative granularity). */
  def shingles(c: Column): Column = array_distinct(tokens(c))

  /** 60-bit-hashed distinct shingle set, SORTED ascending. All downstream
    * set algebra (signatures, intersections, Jaccard) runs in hash space:
    * engine-portable (both Spark and DuckDB compute the identical md5-based
    * hash, so any collision collides identically in both) and far cheaper
    * than UTF8-string set ops — a long compares in one instruction. Sorted
    * so intersections use the allocation-free merge-walk kernel
    * (graft.functions.ArrayKernels.sortedIntersectCount).
    *
    * Computed by the fused tokenize→hash kernel (SketchKernels
    * .tokensHash60): one compiled pass replaces the interpreted
    * `array_sort(array_distinct(transform(filter(split(...)), md5→hex→
    * substr→conv)))` chain, which paid four expression nodes per token
    * plus two intermediate arrays per row. Bit-identical (spec-asserted
    * against [[hashedShinglesHof]] over the corpus). */
  def hashedShingles(c: Column): Column =
    graft.functions.SketchKernels.tokensHash60(c, P, distinctSorted = true)

  /** The pre-kernel HOF formulation — the semantic definition the kernel
    * must match; kept for the bit-identity regression spec. */
  def hashedShinglesHof(c: Column): Column =
    array_sort(array_distinct(transform(tokens(c), s => pmod(hash60(s), lit(P)))))

  /** MinHash signature: ARRAY<LONG> of NumPerms minima, computed by the
    * codegen'd kernel (graft.functions.SketchKernels.minhashSignature) —
    * one straight-line loop over local longs per row, inlined into
    * whole-stage codegen. Replaces the round-1 interpreted
    * `aggregate ∘ zip_with` fold, which allocated a NumPerms-wide
    * accumulator array and evaluated 64 interpreted lambda closures per
    * shingle (q41 was 14.9s at sf0.1 with the fold; the kernel removes
    * that entire cost while producing bit-identical signatures).
    *
    * Takes the [[hashedShingles]] array (ARRAY<LONG>, values in [0, P)). */
  def minhashSignature(hs: Column): Column =
    graft.functions.SketchKernels.minhashSignature(hs, permA, permB, P)

  // SQL fragments shared by the oracles (same constants, same pipeline).
  private[llm] val permRowsSql: String =
    (0 until NumPerms).map(i => s"(${i}, ${permA(i)}, ${permB(i)})").mkString(", ")

  /** doc_id, hs (hashed shingle set), sig(i)=min over hashes — oracle CTE
    * prefix. `hs` mirrors [[hashedShingles]] exactly: distinct-of-hashes. */
  private[llm] val sigCteSql: String =
    s"""sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''),
       |      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % $P)) AS hs
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, unnest(hs) AS h FROM sh
       |), perms(i, a, b) AS (VALUES $permRowsSql),
       |sigs AS (
       |  SELECT doc_id, i, MIN((a * h + b) % $P) AS sig
       |  FROM th CROSS JOIN perms GROUP BY doc_id, i
       |)""".stripMargin

  // ------------------------------------------------- q40 minhash signatures

  /** Signature digest per doc — oracle-checks the MinHash machinery itself. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), minhashSignature(hashedShingles(col("text"))).as("sig"))
      .select(col("doc_id"),
        element_at(col("sig"), 1).as("sig0"),
        element_at(col("sig"), 32).as("sig31"),
        element_at(col("sig"), 64).as("sig63"),
        array_min(col("sig")).as("sig_min"),
        array_max(col("sig")).as("sig_max"))
      .orderBy(col("doc_id"))

  val minhashSignaturesSql: String =
    s"""WITH $sigCteSql
       |SELECT doc_id,
       |  MIN(CASE WHEN i = 0 THEN sig END) AS sig0,
       |  MIN(CASE WHEN i = 31 THEN sig END) AS sig31,
       |  MIN(CASE WHEN i = 63 THEN sig END) AS sig63,
       |  MIN(sig) AS sig_min, MAX(sig) AS sig_max
       |FROM sigs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- q41 minhash LSH near-dups

  val Bands = 8
  val RowsPerBand = 8 // threshold ~ (1/8)^(1/8) ≈ 0.77

  /** MinHash + LSH banding near-duplicate pairs, verified with exact Jaccard
    * ≥ 0.9. The self-join key is (band index, band slice of the signature) —
    * an equi-join Spark shuffles on; no O(n²) pass ever happens.
    *
    * Shape matters at scale:
    *  - the band self-join and the pair-dedup carry ONLY doc ids + one 64-bit
    *    band key (`xxhash64(band, slice)`) — the shingle payload is attached
    *    AFTER `distinct()` via two slim equi-joins, so the wide arrays are
    *    never duplicated 8× per band nor shuffled through the dedup exchange
    *    (the naive shingles-through-the-join version was 40× slower at sf0.1;
    *    a band-key hash collision can only ADD a candidate, which the exact
    *    verify then scores — never lose one);
    *  - verification runs in hash space ([[hashedShingles]]) with an exact
    *    size-ratio prescreen (`J(a,b) ≤ min/max` ⇒ `10·min ≥ 9·max` is
    *    necessary for J ≥ 0.9) so most candidates never pay the intersection;
    *  - the output is totally ordered via single-partition sort, NOT
    *    `orderBy`: a global range sort would re-execute this whole pipeline a
    *    second time just to sample partition boundaries. At 100 TB the result
    *    set itself is large — there you would drop the sort or accept the
    *    range-exchange; the pair generation above is the part that scales. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame =
    lshVerifiedPairs(spark, dir)
      .repartition(1).sortWithinPartitions(col("id_a"), col("id_b"))

  /** One row per DISTINCT hashed-shingle set: `gid` = min doc_id among the
    * docs sharing the set, `members` = all their doc_ids sorted ascending.
    *
    * This is the exact-dedup cascade tier applied at the shingle-set
    * granularity: docs with identical sets have identical signatures,
    * identical band keys and pairwise Jaccard exactly 1, so running LSH
    * per distinct SET loses nothing and shrinks dense buckets
    * quadratically — exactly the "collapse identical-text mega-clusters
    * upstream" skew mitigation this file's header prescribes, done
    * inside the operator so every consumer gets it. At sf0.1: 5000 docs
    * → 3935 groups (largest 248 docs), raw band candidates 9.62M → 2.47M
    * (measured 2026-08-12). At 100 TB the groupBy is one shuffle of the
    * shingle sets — the same cost class as the q20 exact-dedup pass a
    * curation pipeline already pays. */
  def shingleGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), hashedShingles(col("text")).as("hs"))
      .groupBy(col("hs"))
      .agg(min(col("doc_id")).as("gid"),
        sort_array(collect_list(col("doc_id"))).as("members"))

  /** LSH band keys for an (id, hs) frame: one row per (id, band), keyed
    * by `xxhash64(band index, signature slice)` — THE banding definition,
    * shared by the self-join (q41/q50/q55 via [[landedScoredPairs]]) and
    * the asymmetric probe join (q68), so a change to Bands/RowsPerBand or
    * the band-key hash cannot make them silently disagree. */
  private[llm] def bandKeys(df: DataFrame, idCol: String,
                            payload: Seq[String] = Nil): DataFrame = df
    .withColumn("sig", minhashSignature(col("hs")))
    .select(col(idCol) +: payload.map(col) :+
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)))): _*)
    .select(col(idCol) +: payload.map(col) :+
      xxhash64(col("pos"), col("col")).as("bkey"): _*)

  /** Public band-key entry for cross-module consumers (the streaming
    * near-dup ingest gate): the SAME definition as the q41 pipeline —
    * one source of truth for the banding, so batch and stream cannot
    * silently disagree. Expects `(idCol, hs)`. */
  def bandKeysFor(df: DataFrame, idCol: String): DataFrame = bandKeys(df, idCol)

  /** [[bandKeysFor]] with payload columns carried THROUGH the band
    * expansion (each of the `Bands` rows repeats the payload). Exists
    * for streaming consumers: a stream that expands bands slim and then
    * re-joins itself to recover its payload is a stream-stream self-join
    * whose buffers never evict — carrying the payload makes every
    * downstream join stream-static, so the only state left is the final
    * watermark-evicted aggregation. The cost is explicit and bounded:
    * the payload (for the ingest gate, `ts` + the hashed-shingle array)
    * is replicated ×`Bands` within the micro-batch only — it never
    * enters join state. */
  def bandKeysKeepingFor(df: DataFrame, idCol: String,
                         payload: Seq[String]): DataFrame =
    bandKeys(df, idCol, payload)

  /** The pair pipeline without q41's presentation sort — consumers that
    * only need the pair set (q50's near-dup stage) skip the
    * single-partition ordering pass entirely.
    *
    * Doc-space pairs are the rep-space pairs EXPANDED: each group of k
    * identical shingle sets contributes its C(k,2) internal pairs
    * (n_shared = |hs|, jaccard = 1.0 — exactly what the verify kernel
    * returns for identical sorted sets), and each verified rep pair
    * (A, B) expands to all |A|·|B| cross pairs carrying the rep pair's
    * n_shared/jaccard (hs is constant within a group, so every cross
    * pair's verification is the rep pair's). Every doc pair belongs to
    * exactly one of those cases, so no final distinct is needed — the
    * 958k-row doc-pair set never passes through a dedup exchange. */
  private val groupsMemo =
    new graft.SessionMemo[(SparkSession, String, Option[String]), DataFrame]("shingle_groups")

  /** [[shingleGroups]] landed ONCE per (session, dir, durability regime)
    * — the d7258c8 front-end idiom (kmeans assignment, co-purchase
    * counts): four query families (q41/q50 verified pairs, q85's
    * near-dup membership, q147's tuning curve, plus every
    * lshVerifiedPairs consumer) read the identical rep-space frame, and
    * without the memo each registered query re-ran the corpus tokenize +
    * shingle hash-aggregate from scratch. Same process-lifetime
    * retention note as the co-purchase memo; at 100 TB this is a landed
    * bucketed catalog table with a content fingerprint, not a session
    * memo. Lineage is cut by the checkpoint (stats-less LogicalRDD), and
    * the frame grows with distinct corpus content — so consumers attach
    * it RUNTIME-SIZE-DECIDED ([[graft.Dist.sizedBroadcast]], r12): the
    * materialized checkpoint's measured size picks broadcast under the
    * bound and the gid/doc_id shuffle join past it, never an
    * unconditional hint (the r10 judge finding; PlanHygieneSpec's
    * broadcast-bound rule reads the measurement registry). */
  private[llm] def landedShingleGroups(spark: SparkSession, dir: String): DataFrame =
    groupsMemo.getOrCompute(memoKey(spark, dir))(
      _ => shingleGroups(spark, dir).transform(Dist.durableCkpt))

  private val pairsMemo =
    new graft.SessionMemo[(SparkSession, String, Option[String]), DataFrame]("verified_pairs")
  private val scoredMemo =
    new graft.SessionMemo[(SparkSession, String, Option[String]), DataFrame]("scored_pairs")

  /** EVERY banded rep-pair candidate scored exactly — (gid_a, gid_b,
    * sz_a, sz_b, n_shared), landed ONCE per (session, dir, durability
    * regime). This is the ONE scoring pass the whole near-dup family
    * shares (r11 judge task 3: q197 re-ran a private full-range scoring
    * pass per query while [[landedRepPairs]] ran the verified-only twin
    * of the same band self-join + kernel — two passes over identical
    * candidates): q197 needs the FULL bp range (its negatives are the
    * sub-0.9 scores, so no size-ratio prefilter may run here), and the
    * verified frame every other consumer reads is the jaccard ≥ 0.9
    * slice of this one. Candidates dedup BEFORE the verify in this
    * shape — unlike a verified-only flow (where survivors are 10x
    * smaller than candidates and a late distinct won, re-measured
    * 2026-08-12: early distinct 3.04s vs 2.14s q41 min-of-3 at 2.47M
    * doc-space candidates), here every scored pair lands, so dedup-late
    * would shuffle the same cardinality after paying k redundant kernel
    * runs. Payload attaches are runtime-size-decided
    * ([[graft.Dist.sizedBroadcast]]). */
  private[llm] def landedScoredPairs(spark: SparkSession, dir: String): DataFrame =
    scoredMemo.getOrCompute(memoKey(spark, dir)) { _ =>
      val sets = landedShingleGroups(spark, dir).filter(size(col("hs")) > 0)
        .select(col("gid"), col("hs"))
      val sized = Dist.sizedBroadcast(sets)
      val banded = bandKeys(sets, "gid")
      banded.select(col("bkey"), col("gid").as("gid_a"))
        .join(banded.select(col("bkey"), col("gid").as("gid_b")), Seq("bkey"))
        .filter(col("gid_a") < col("gid_b"))
        .select(col("gid_a"), col("gid_b")).distinct()
        .join(sized.select(col("gid").as("gid_a"), col("hs").as("hs_a")), Seq("gid_a"))
        .join(sized.select(col("gid").as("gid_b"), col("hs").as("hs_b")), Seq("gid_b"))
        .withColumn("sz_a", size(col("hs_a"))).withColumn("sz_b", size(col("hs_b")))
        .withColumn("n_shared",
          graft.functions.ArrayKernels.sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("gid_a"), col("gid_b"), col("sz_a"), col("sz_b"), col("n_shared"))
        .transform(Dist.durableCkpt)
    }

  /** The VERIFIED rep-space pair frame — the jaccard ≥ 0.9 slice of
    * [[landedScoredPairs]], landed ONCE per (session, dir, durability
    * regime). Before this memo every consumer (q41/q50/q55's edges,
    * q85's membership, q197's positives-adjacent paths, q199's flow
    * census) re-paid the band self-join + exact verify per query; since
    * r12 the scoring pass itself is shared with q197's full-range
    * consumer, so the suite runs it once. jaccard derives from the
    * landed integers exactly as the r11 verify computed it (same
    * int-division-to-double chain → bit-identical doubles, hashes
    * unchanged). The landed frame is slim — one row per verified rep
    * pair, ∝ true duplicate density at scale. Same process-lifetime
    * retention contract as [[groupsMemo]]; at 100 TB both land beside
    * the groups table in the bucketed catalog. */
  private[llm] def landedRepPairs(spark: SparkSession, dir: String): DataFrame =
    pairsMemo.getOrCompute(memoKey(spark, dir))(
      _ => landedScoredPairs(spark, dir)
        .withColumn("jaccard",
          col("n_shared") / (col("sz_a") + col("sz_b") - col("n_shared")))
        .filter(col("jaccard") >= 0.9)
        .select(col("gid_a"), col("gid_b"), col("n_shared"), col("jaccard"))
        .transform(Dist.durableCkpt))

  def lshVerifiedPairs(spark: SparkSession, dir: String): DataFrame = {
    // ONE materialization of the groups aggregate: grps feeds the within
    // branch and the two expansion attaches; the verified rep pairs are
    // the second landed frame ([[landedRepPairs]]) — without the
    // checkpoints each reference re-runs the corpus scan +
    // hash-aggregate (no plan CSE across union/join branches); the
    // session memos additionally share those materializations across
    // every consumer query.
    val grps = landedShingleGroups(spark, dir)
    // size(hs) > 0 is load-bearing, not an optimization: token-free docs
    // (empty/whitespace text) share hs = [] and would expand to pairs
    // with jaccard "1.0", but the verify kernel computes 0/0 -> NULL for
    // them (filtered), and the oracle emits no sigs at all — emitting
    // the pair would diverge from both
    val within = grps.filter(size(col("members")) > 1 && size(col("hs")) > 0)
      .select(size(col("hs")).cast("long").as("n_shared"), col("members"))
      .select(col("n_shared"), explode(col("members")).as("id_a"), col("members"))
      .select(col("id_a"),
        explode(filter(col("members"), m => m > col("id_a"))).as("id_b"),
        col("n_shared"), lit(1.0).as("jaccard"))
    // runtime-size-decided attach (see landedScoredPairs): measured
    // under the bound -> broadcast; over it -> the gid shuffle join
    val slim = Dist.sizedBroadcast(grps.select(col("gid"), col("members")))
    val cross = landedRepPairs(spark, dir)
      .join(slim.select(col("gid").as("gid_a"), col("members").as("ma")), Seq("gid_a"))
      .join(slim.select(col("gid").as("gid_b"), col("members").as("mb")), Seq("gid_b"))
      .select(explode(col("ma")).as("x"), col("mb"), col("n_shared"), col("jaccard"))
      .select(col("x"), explode(col("mb")).as("y"), col("n_shared"), col("jaccard"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("n_shared"), col("jaccard"))
    within.select(col("id_a"), col("id_b"), col("n_shared"), col("jaccard"))
      .union(cross)
  }

  val minhashLshPairsSql: String =
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), verified AS (
       |  SELECT id_a, id_b,
       |    len(list_intersect(sa.hs, sb.hs)) AS n_shared,
       |    CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |)
       |SELECT id_a, id_b, n_shared, jaccard FROM verified
       |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------- q42 n-gram Jaccard ranking

  /** Word-bigram Jaccard, top-50 most similar pairs over a bounded id range
    * (brute force — the oracle-checked baseline the LSH path approximates).
    *
    * Bigrams live in hash space: each token hashed once (`h_i < P`), bigram
    * id = `h_i · P + h_{i+1}` — injective over the hash pair, fits a long
    * with no overflow (P² < 2^62; DuckDB BIGINT overflow would error, Java
    * would silently wrap — neither happens). One zip_with over the shifted
    * array replaces the indexed form `transform(sequence(...), i =>
    * element_at(toks, i) …)`, whose `toks` subtree is re-tokenized per
    * index by the lambda binder. Sorted sets feed the codegen'd
    * merge-intersect kernel. */
  def ngramJaccardTopk(spark: SparkSession, dir: String): DataFrame = {
    // ordered token-hash multiset (fused kernel; NOT distinct — bigrams
    // need adjacency)
    val hs = graft.functions.SketchKernels.tokensHash60(col("text"), P, distinctSorted = false)
    val grams = array_sort(array_distinct(array_compact(
      zip_with(hs, slice(hs, lit(2), greatest(size(hs) - 1, lit(0))),
        (a, b) => a * lit(P) + b))))
    val d = Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"), grams.as("g"))
    val a = d.select(col("doc_id").as("id_a"), col("g").as("g_a"))
    val b = d.select(col("doc_id").as("id_b"), col("g").as("g_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("n_shared",
        graft.functions.ArrayKernels.sortedIntersectCount(col("g_a"), col("g_b")))
      .withColumn("jaccard", col("n_shared") /
        (size(col("g_a")) + size(col("g_b")) - col("n_shared")))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  val ngramJaccardTopkSql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    list_distinct([hs[i] * $P + hs[i+1] for i in range(1, len(hs))]) AS g
       |  FROM (SELECT doc_id,
       |          list_transform(
       |            list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''),
       |            t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % $P) AS hs
       |        FROM documents WHERE doc_id < 300)
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  len(list_intersect(a.g, b.g)) AS n_shared,
       |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
       |FROM g a JOIN g b ON a.doc_id < b.doc_id
       |ORDER BY jaccard DESC, id_a, id_b LIMIT 50""".stripMargin

  // ------------------------------------------------------------ q43 simhash

  // 60 bits (widened from 32 in r9): the sketch width bounds BOTH the
  // random-collision floor of the verify AND — through the 4-band index
  // q53 builds on it — the candidate volume. With 8-bit bands (32-bit
  // sketch) a band has only 256 buckets, so banding collapses to
  // ~n²/1024 candidate growth: the BENCH_SF1 10× sweep measured q53 at
  // 17.7× wall (quadratic shape) and flagged it. 15-bit bands (60-bit
  // sketch, 32768 buckets per band) push the per-band random-collision
  // floor to ~n²/131072 — candidates return to ∝ true near-dup density
  // at any realistic shard size, and 60 stays sign-safe as a positive
  // BIGINT in both engines (the token hash is already 60-bit).
  val SimhashBits = 60

  /** 60-bit SimHash over (multiset) tokens: bit k set iff the sum over
    * tokens of ±1 (sign = bit k of the token hash) is positive. Computed by
    * the codegen'd kernel (SketchKernels.simhash) — one pass over the
    * token-hash array with a local counter array, replacing the round-1
    * interpreted fold that allocated a 32-wide accumulator per token. */
  def simhashOf(text: Column): Column =
    graft.functions.SketchKernels.simhash(
      graft.functions.SketchKernels.tokensHash60(text, mod = 0L, distinctSorted = false),
      SimhashBits)

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), simhashOf(col("text")).as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("simhash"))
  }

  val simhashSql: String = {
    val bitSums = (0 until SimhashBits)
      .map(k => s"SUM(((h >> $k) & 1) * 2 - 1) AS b$k").mkString(",\n      |    ")
    val shExpr = (0 until SimhashBits)
      .map(k => s"(CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM th GROUP BY doc_id
       |), s AS (SELECT doc_id, CAST($shExpr AS BIGINT) AS simhash FROM bits)
       |SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
       |FROM s GROUP BY simhash ORDER BY simhash""".stripMargin
  }

  // ----------------------------------------- q53 simhash near-dup (hamming)

  /** SimHash near-duplicate pairs: candidates share at least one of four
    * 15-bit bands of the 60-bit simhash (a pair within hamming distance 3
    * must agree on ≥1 band — pigeonhole, so banding misses nothing at this
    * radius), verified by exact hamming distance ≤ 3 via xor + bit_count.
    * Band width is the scale lever (see the [[SimhashBits]] note): 8-bit
    * bands measured quadratic at the 10× sweep; 15-bit bands keep the
    * candidate stream ∝ near-dup density.
    * Same slim-join shape as MinHash-LSH (q41) but the "signature" is one
    * 64-bit integer — the cheapest near-dup tier of the cascade. */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhashOf(col("text")).as("sh"))
    // band value b of the 60-bit sketch: (sh div 32768^b) % 32768 — exact integer math
    val keyed = docs.select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 3), b -> (sh div CAST(pow(32768, b) AS BIGINT)) % 32768)")))
      .select(col("doc_id"), xxhash64(col("pos"), col("col")).as("bkey"))
    val cand = keyed.select(col("bkey"), col("doc_id").as("id_a"))
      .join(keyed.select(col("bkey"), col("doc_id").as("id_b")), Seq("bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
      .repartition(1).sortWithinPartitions(col("id_a"), col("id_b"))
  }

  val simhashNearDupSql: String = {
    val bitSums = (0 until SimhashBits)
      .map(k => s"SUM(((h >> $k) & 1) * 2 - 1) AS b$k").mkString(",\n      |    ")
    val shExpr = (0 until SimhashBits)
      .map(k => s"(CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM th GROUP BY doc_id
       |), s AS (SELECT doc_id, CAST($shExpr AS BIGINT) AS sh FROM bits),
       |keyed AS (
       |  SELECT doc_id, b AS band, (sh // CAST(pow(256, b) AS BIGINT)) % 256 AS bval
       |  FROM s, range(0, 4) t(b)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM keyed a JOIN keyed b ON a.band = b.band AND a.bval = b.bval
       |  WHERE a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa.sh, sb.sh)) AS INT) AS hamming
       |FROM cand JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
       |WHERE bit_count(xor(sa.sh, sb.sh)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ------------------------------------------- q44 brute-force cosine top-k

  /** floor(x * 2^20) quantization — exact in both engines (see header). */
  def quantize(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1048576.0).cast("long"))

  /** Integer dot product — codegen'd merge loop (ArrayKernels.dotLong),
    * replacing the interpreted aggregate∘zip_with fold that allocated an
    * intermediate array per evaluation. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.ArrayKernels.dotLong(a, b)

  /** Brute-force cosine top-5 neighbors for probe vectors (vec_id < 8).
    * The probe side is tiny → broadcast; the scan side streams. This is the
    * exact baseline; q46 is the LSH approximation of the same answer. */
  def cosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
    val probes = broadcast(e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("q").as("pq")))
    val scored = e.crossJoin(probes).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", dotQ(col("pq"), col("q")) /
        (sqrt(dotQ(col("pq"), col("pq"))) * sqrt(dotQ(col("q"), col("q")))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  val cosineTopkSql: String =
    """WITH q AS (
      |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, q, list_sum([x * x for x in q]) AS nrm FROM q
      |), pairs AS (
      |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
      |    CAST(list_sum([p.q[i] * e.q[i] for i in range(1, 65)]) AS DOUBLE)
      |      / (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(e.nrm AS DOUBLE))) AS cos
      |  FROM norms p JOIN norms e ON e.vec_id <> p.vec_id
      |  WHERE p.vec_id < 8
      |), ranked AS (
      |  SELECT probe_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
      |  FROM pairs
      |)
      |SELECT probe_id, neighbor_id, cos, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin

  // ------------------------------------------------- q45/q46 hyperplane LSH

  val NumPlanes = 6

  /** Deterministic pseudo-random hyperplane weight, plane i ∈ [0,6), dim j ∈
    * [1,64]: identical closed form in both engines. */
  private def planeWeight(i: Int, j: Int): Long = ((i * 37 + j * 101) % 19) - 9

  /** LSH bucket id of a quantized vector: 6 sign bits of integer dot
    * products with the fixed planes. */
  def lshBucket(q: Column): Column = {
    val bits = (0 until NumPlanes).map { i =>
      val ws = (1 to 64).map(j => planeWeight(i, j))
      val dot = graft.functions.ArrayKernels.dotLong(q, typedLit(ws))
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def lshBucketSql(qcol: String): String =
    "CAST(" + (0 until NumPlanes).map { i =>
      val terms = (1 to 64).map(j => s"$qcol[$j] * (${planeWeight(i, j)})").mkString(" + ")
      s"(CASE WHEN $terms > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ") + " AS BIGINT)"

  /** Bucket histogram: shows the partitioning the ANN path joins on. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), lshBucket(quantize(col("embedding"))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("first_vec"))
      .orderBy(col("bucket"))

  val lshBucketsSql: String =
    s"""WITH q AS (
       |  SELECT vec_id, label,
       |    [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings
       |), b AS (SELECT vec_id, label, ${lshBucketSql("q")} AS bucket FROM q)
       |SELECT bucket, COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels,
       |  MIN(vec_id) AS first_vec
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** ANN via LSH: probes (vec_id < 8) match only their own bucket, then
    * exact cosine top-3 within it. The cross join of q44 becomes a bucket
    * equi-join — the shape that scales (shuffle keyed by bucket). */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("bucket", lshBucket(col("q")))
    val probes = broadcast(e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("bucket")))
    val scored = e.join(probes, Seq("bucket")).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", dotQ(col("pq"), col("q")) /
        (sqrt(dotQ(col("pq"), col("pq"))) * sqrt(dotQ(col("q"), col("q")))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("bucket"), col("cos"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  val annLshTopkSql: String =
    s"""WITH q AS (
       |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings
       |), b AS (
       |  SELECT vec_id, q, ${lshBucketSql("q")} AS bucket,
       |    list_sum([x * x for x in q]) AS nrm
       |  FROM q
       |), pairs AS (
       |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id, p.bucket AS bucket,
       |    CAST(list_sum([p.q[i] * e.q[i] for i in range(1, 65)]) AS DOUBLE)
       |      / (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(e.nrm AS DOUBLE))) AS cos
       |  FROM b p JOIN b e ON p.bucket = e.bucket AND e.vec_id <> p.vec_id
       |  WHERE p.vec_id < 8
       |), ranked AS (
       |  SELECT probe_id, neighbor_id, bucket, cos,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM pairs
       |)
       |SELECT probe_id, neighbor_id, bucket, cos, CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin

  // -------------------------------------------- q48 embedding-cosine near-dup

  /** Embedding-cosine near-duplicate pairs: every pair with cosine ≥ 0.4
    * over a bounded id range (the synthetic corpus's similarity tail — no
    * pair exceeds 0.6, so a "classic" 0.9 threshold would be vacuous).
    * This is the exact brute-force baseline, bounded to vec_id < 500 like
    * q42; the 100 TB path replaces the O(n²) pair join with the q46 LSH
    * bucket equi-join and runs this verification only within buckets. */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 500)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", dotQ(col("q"), col("q")))
    val a = e.select(col("vec_id").as("id_a"), col("q").as("qa"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("q").as("qb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotQ(col("qa"), col("qb")) /
        (sqrt(col("na")) * sqrt(col("nb"))))
      .filter(col("cos") >= 0.4)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val cosineNearDupSql: String =
    """WITH q AS (
      |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
      |  FROM embeddings WHERE vec_id < 500
      |), n AS (
      |  SELECT vec_id, q, list_sum([x * x for x in q]) AS nrm FROM q
      |)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  CAST(list_sum([a.q[i] * b.q[i] for i in range(1, 65)]) AS DOUBLE)
      |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE CAST(list_sum([a.q[i] * b.q[i] for i in range(1, 65)]) AS DOUBLE)
      |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------- q49 IVF-style ANN

  /** IVF (inverted-file) ANN: a coarse quantizer (per-label centroids)
    * partitions vectors into cells; each probe scores only the centroids
    * (tiny) to pick its cell, then runs exact top-3 inside that one
    * inverted list. This is the other classic ANN scale path next to
    * hyperplane LSH (q46): centroids broadcast, the fine search is an
    * equi-join on cell — at 100 TB the inverted lists are the partition
    * layout, so a probe touches 1/k of the data.
    *
    * Exactness for the oracle: centroids are elementwise integer sums
    * scaled by floor(sum/count) — cosine is scale-invariant, and keeping
    * the centroid integral makes every dot/norm exact 64-bit arithmetic;
    * the only doubles are final correctly-rounded divisions, identical in
    * both engines. */
  def annIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("q"))
    // coarse quantizer: scaled integral centroid per label
    val cents = e.select(col("label"), posexplode(col("q")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cent"))
      .select(col("label").as("cell"), col("cent"))
    // cell assignment: argmax cosine over the (broadcast) centroid set
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("cscore", dotQ(col("q"), col("cent")) /
        (sqrt(dotQ(col("q"), col("q"))) * sqrt(dotQ(col("cent"), col("cent")))))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell"))
    val assigned = scored.withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("q"), col("cell"))
    // fine search: probes scan only their own cell
    val probes = broadcast(assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("cell")))
    val pairs = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", dotQ(col("pq"), col("q")) /
        (sqrt(dotQ(col("pq"), col("pq"))) * sqrt(dotQ(col("q"), col("q")))))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rnk", row_number().over(wTop)).filter(col("rnk") <= 3)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("cell"), col("cos"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  val annIvfTopkSql: String =
    """WITH q AS (
      |  SELECT vec_id, label, [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
      |  FROM embeddings
      |), sums AS (
      |  SELECT label, pos, SUM(v) AS s, COUNT(*) AS n
      |  FROM (SELECT label, unnest(q) AS v, unnest(range(1, 65)) AS pos FROM q)
      |  GROUP BY label, pos
      |), cents AS (
      |  SELECT label AS cell,
      |    list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cent
      |  FROM sums GROUP BY label
      |), scored AS (
      |  SELECT q.vec_id, q.q, c.cell,
      |    CAST(list_sum([q.q[i] * c.cent[i] for i in range(1, 65)]) AS DOUBLE)
      |      / (sqrt(CAST(list_sum([x * x for x in q.q]) AS DOUBLE))
      |         * sqrt(CAST(list_sum([x * x for x in c.cent]) AS DOUBLE))) AS cscore
      |  FROM q CROSS JOIN cents c
      |), assigned AS (
      |  SELECT vec_id, q, cell FROM (
      |    SELECT vec_id, q, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cell) AS r
      |    FROM scored) WHERE r = 1
      |), pairs AS (
      |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id, e.cell,
      |    CAST(list_sum([p.q[i] * e.q[i] for i in range(1, 65)]) AS DOUBLE)
      |      / (sqrt(CAST(list_sum([x * x for x in p.q]) AS DOUBLE))
      |         * sqrt(CAST(list_sum([x * x for x in e.q]) AS DOUBLE))) AS cos
      |  FROM assigned p JOIN assigned e ON p.cell = e.cell AND e.vec_id <> p.vec_id
      |  WHERE p.vec_id < 8
      |), ranked AS (
      |  SELECT probe_id, neighbor_id, cell, cos,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
      |  FROM pairs
      |)
      |SELECT probe_id, neighbor_id, CAST(cell AS INT) AS cell, cos, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin

  // ---------------------------------------------- q183 product-quantized ANN

  /** Subspace count (4 × 16 dims) and per-subspace codebook size for q183.
    * 4 codes × 4 bits of codebook id ≈ 4 bytes per vector vs 256 bytes of
    * float32 — the 64× compression that lets a billion-vector index live
    * in memory. */
  val PqM = 4
  val PqSubDim = 16
  val PqK = 16

  /** q183: PRODUCT-QUANTIZATION ANN (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011) — the third classic ANN
    * scale path beside hyperplane LSH (q46) and IVF (q49), and the
    * missing member of this engine's quantization family (int8 ANN q70
    * compresses 4×; PQ compresses 64×). The vector is split into
    * [[PqM]] orthogonal subspaces; each subspace trains its own
    * [[PqK]]-centroid codebook (one integer Lloyd iteration, the q75
    * idiom); a vector's index entry is just its 4 subspace code ids.
    * A probe never decodes anything: it builds a 4×16 lookup table of
    * exact subspace distances to every centroid once, and each
    * candidate's approximate squared L2 distance is the SUM OF 4 TABLE
    * LOOKUPS (asymmetric distance computation).
    *
    * Cross-engine exactness (the q75 discipline, per subspace): all
    * distances are ‖a‖² − 2a·b + ‖b‖² over exact 64-bit ints
    * (|q| ≤ 2²⁰, 16-dim dots ≤ 2⁴⁴; ADC sums of 4 fit trivially),
    * argmin ties break on the lowest code via `min(struct)`, centroid
    * updates are floor(sum/count) with one correctly-rounded double
    * division, and an empty cell drops out of the codebook identically
    * in both engines — so codebooks, codes, LUTs and the final ADC
    * ranking are all bit-identical and the oracle gates them exactly.
    *
    * 100 TB shape: training = two assigns + one update over the
    * checkpointed subvector frame (at scale you'd train the ≤64-row
    * codebook on a sample and only ENCODE the full corpus — one
    * broadcast-join pass); the index is 4 small ints per vector; the
    * ADC scan is MAP-ONLY (per-probe LUTs broadcast as maps, the
    * distance is 4 `element_at`s — no join, no decode, no shuffle), and
    * the top-5 uses the mergeable bounded [[graft.functions.TopK]]
    * aggregate, so each probe ships 5 rows per partition instead of
    * sorting the corpus through an 8-partition window exchange. */
  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
    // subvector frame (vec_id, m, qs): feeds c0, both assigns, the
    // update and the probe LUTs — checkpoint once
    val sub = e.select(col("vec_id"), explode(
        transform(sequence(lit(0), lit(PqM - 1)), m =>
          struct(m.as("m"),
            slice(col("q"), m * lit(PqSubDim) + lit(1), lit(PqSubDim)).as("qs")))).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.qs").as("qs"))
      .transform(Dist.durableCkpt)
    def dist2(a: Column, b: Column): Column =
      dotQ(a, a) - lit(2L) * dotQ(a, b) + dotQ(b, b)
    // one Lloyd iteration per subspace, keyed by m throughout
    def assign(cents: DataFrame): DataFrame =
      sub.join(broadcast(cents), Seq("m"))
        .withColumn("d", dist2(col("qs"), col("qc")))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("d"), col("code"))).as("mn"))
        .select(col("vec_id"), col("m"), col("mn").getField("code").as("code"))
    def update(assigned: DataFrame): DataFrame =
      assigned.join(sub, Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("qs")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .withColumn("v", floor(col("s").cast("double") / col("n")).cast("long"))
        .groupBy(col("m"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v")).as("qc"))
        .transform(Dist.durableCkpt) // ≤ M·K = 64 rows; truncates lineage
    val c0 = sub.filter(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").cast("int").as("code"), col("qs").as("qc"))
    val c1 = update(assign(c0))
    // the index: 4 codes per vector, in subspace order
    val codeArr = assign(c1).groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("codes"))
    // per-probe ADC lookup table: exact distance to every surviving
    // centroid, keyed m·K + code (codes only ever reference survivors)
    val lut = sub.filter(col("vec_id") < 8)
      .withColumnRenamed("vec_id", "probe_id")
      .join(c1, Seq("m"))
      .withColumn("d", dist2(col("qs"), col("qc")))
      .groupBy(col("probe_id"))
      .agg(map_from_entries(collect_list(
        struct(col("m") * lit(PqK) + col("code"), col("d")))).as("lut"))
    val adc = codeArr.crossJoin(broadcast(lut))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adc_dist", (0 until PqM).map(m =>
        element_at(col("lut"), lit(m * PqK) + element_at(col("codes"), m + 1)))
        .reduce(_ + _))
    adc.groupBy(col("probe_id"))
      .agg(graft.functions.TopK.decimalTopK(
        (-col("adc_dist")).cast("decimal(20,0)"), col("vec_id"), 5).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), col("col").getField("id").as("neighbor_id"),
        (-col("col").getField("score")).cast("long").as("adc_dist"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  val pqAnnSql: String = {
    def d2(a: String, b: String): String =
      s"""CAST(list_sum([$a[i] * $a[i] for i in range(1, ${PqSubDim + 1})]) AS BIGINT)
         |      - 2 * CAST(list_sum([$a[i] * $b[i] for i in range(1, ${PqSubDim + 1})]) AS BIGINT)
         |      + CAST(list_sum([$b[i] * $b[i] for i in range(1, ${PqSubDim + 1})]) AS BIGINT)""".stripMargin
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings
       |), sub AS MATERIALIZED (
       |  SELECT vec_id, m, q[m * $PqSubDim + 1 : m * $PqSubDim + $PqSubDim] AS qs
       |  FROM (SELECT vec_id, q, unnest(generate_series(0, ${PqM - 1})) AS m FROM q)
       |), c0 AS (
       |  SELECT m, CAST(vec_id AS INT) AS code, qs AS qc FROM sub WHERE vec_id < $PqK
       |), a1 AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code, ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |      ORDER BY ${d2("s.qs", "c.qc")}, c.code) AS r
       |    FROM sub s JOIN c0 c ON s.m = c.m) WHERE r = 1
       |), c1 AS MATERIALIZED (
       |  SELECT m, code, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS qc
       |  FROM (SELECT a.m, a.code, sv.pos, SUM(sv.v) AS s, COUNT(*) AS n
       |        FROM a1 a JOIN (SELECT vec_id, m, unnest(qs) AS v,
       |                          unnest(range(1, ${PqSubDim + 1})) AS pos FROM sub) sv
       |          ON a.vec_id = sv.vec_id AND a.m = sv.m
       |        GROUP BY 1, 2, 3)
       |  GROUP BY m, code
       |), codes AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code, ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |      ORDER BY ${d2("s.qs", "c.qc")}, c.code) AS r
       |    FROM sub s JOIN c1 c ON s.m = c.m) WHERE r = 1
       |), lut AS MATERIALIZED (
       |  SELECT p.vec_id AS probe_id, c.m, c.code, ${d2("p.qs", "c.qc")} AS d
       |  FROM sub p JOIN c1 c ON p.m = c.m WHERE p.vec_id < 8
       |), adc AS (
       |  SELECT l.probe_id, co.vec_id, SUM(l.d) AS adc_dist
       |  FROM codes co JOIN lut l ON l.m = co.m AND l.code = co.code
       |  WHERE co.vec_id <> l.probe_id
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT probe_id, vec_id AS neighbor_id, adc_dist,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adc_dist, vec_id) AS rnk
       |  FROM adc
       |)
       |SELECT probe_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       |  CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin
  }

  // -------------------------------------- q75 k-means (Lloyd) over embeddings

  /** Distributed k-means (Lloyd's algorithm, k = 8, two iterations) — the
    * primitive behind IVF coarse-quantizer training (q49's cells assumed
    * labels; this LEARNS them), semantic clustering and data-mixing by
    * embedding region.
    *
    * Cross-engine exactness for an ITERATIVE float algorithm: everything
    * runs in quantized integer space. Distances are
    * ‖a‖² − 2a·b + ‖b‖² over exact 64-bit ints (no FP accumulation —
    * order-independent), argmin ties break on the lowest centroid id via
    * `min(struct(dist, cid))`, and centroid updates are
    * `floor(sum/count)` where the sum is exact and the one double
    * division is correctly rounded in both engines — so both engines walk
    * the IDENTICAL centroid trajectory and the oracle gates the final
    * assignment exactly. An empty cell simply drops out of the update
    * (both engines agree, again exactly).
    *
    * Scale shape: each iteration is (broadcast k centroids → one codegen
    * distance pass over the corpus → slim (vec_id, cid) frame →
    * posexplode keyed (cid, dim) partial-agg). The corpus quantization is
    * checkpointed once; per-round centroid frames are k rows. At 100 TB
    * this is exactly MLlib's k-means dataflow, minus sampling-based init
    * (deterministic first-k init keeps the oracle exact).
    *
    * The (assignment, centroids) pair is landed once per (session, dir)
    * — q75 reports the trajectory summary, q118 consumes the assignment
    * as its semantic-dedup partitioner — with the same serialized-memo
    * shape as [[clusterGroupLabels]]. */
  /** Session-memo key for landed frames. The checkpoint-dir state is part
    * of the key: a frame landed WITHOUT a checkpoint dir holds
    * `localCheckpoint` blocks (executor-memory only), and serving it
    * after a dir is configured would silently downgrade the promised
    * FS-durable path (the cluster analog: state landed under one
    * durability regime serving another). Keying on
    * `getCheckpointDir` makes the memo rebuild — under the new regime —
    * the first time the configuration changes. */
  private def memoKey(spark: SparkSession, dir: String): (SparkSession, String, Option[String]) =
    (spark, dir, spark.sparkContext.getCheckpointDir)

  private val kmeansMemo =
    new graft.SessionMemo[(SparkSession, String, Option[String]), (DataFrame, DataFrame)]("kmeans_state")

  /** Final Lloyd-iteration state: (`a2` = (vec_id, cid) assignment,
    * `c2` = (cid, qc) centroids), both reading checkpointed frames.
    * `k` defaults to the oracle-locked 8; the SemDeDup production shape
    * scales k WITH the corpus (keeping per-cluster sizes bounded, so the
    * within-cluster quadratic step stays linear overall) — ScalingSpec
    * and ScalingBench measure exactly that via this parameter. The memo
    * key carries k, so the landed q75/q118 frames (k = 8) are never
    * mixed with a scaled-k measurement run. */
  private[llm] def kmeansAssignment(spark: SparkSession, dir: String,
      k: Int = 8): (DataFrame, DataFrame) =
    kmeansMemo.getOrCompute(memoKey(spark, s"$dir#k=$k"))({ _ =>
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), quantize(col("embedding")).as("q"))
        .transform(Dist.durableCkpt) // reused by every assign/update pass
      def assign(cents: DataFrame): DataFrame =
        e.crossJoin(broadcast(cents))
          .withColumn("dist",
            dotQ(col("q"), col("q")) - lit(2L) * dotQ(col("q"), col("qc")) +
              dotQ(col("qc"), col("qc")))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m").getField("cid").as("cid"))
      def update(assigned: DataFrame): DataFrame =
        assigned.join(e, Seq("vec_id"))
          .select(col("cid"), posexplode(col("q")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
          .withColumn("v", floor(col("s").cast("double") / col("n")).cast("long"))
          .groupBy(col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
            x => x.getField("v")).as("qc"))
          .transform(Dist.durableCkpt) // k rows; truncates the per-round lineage
      // k = 8 keeps the oracle-locked first-8 init (cid = vec_id); any
      // other k (the scaled-k measurement path) seeds from a
      // deterministic hash ordering so the k seeds spread across the
      // corpus instead of clustering at the lowest ids (first-k over a
      // replicated corpus would seed every centroid inside one copy).
      // The seed-rank window is limit-bounded (k rows).
      val c0 =
        if (k == 8)
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"), col("q").as("qc"))
        else
          e.orderBy(xxhash64(col("vec_id"))).limit(k)
            .withColumn("cid", (row_number().over(
              Window.orderBy(col("vec_id"))) - 1).cast("int"))
            .select(col("cid"), col("q").as("qc"))
      val c1 = update(assign(c0))
      val a2 = assign(c1).transform(Dist.durableCkpt) // read by q75 AND q118
      val c2 = update(a2)
      (a2, c2)
    })

  def kmeans(spark: SparkSession, dir: String): DataFrame = {
    val (a2, c2) = kmeansAssignment(spark, dir)
    a2.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))
      .join(c2.select(col("cid"), element_at(col("qc"), 1).as("c0")), Seq("cid"))
      .orderBy(col("cid"))
  }

  /** The Lloyd-iteration CTE chain (through the final assignment `a2`
    * and centroids `c2`) shared by the q75 and q118 oracles. */
  private val kmeansCteSql: String = {
    def distSql(v: String, c: String): String =
      s"""CAST(list_sum([$v.q[i] * $v.q[i] for i in range(1, 65)]) AS BIGINT)
         |      - 2 * CAST(list_sum([$v.q[i] * $c.qc[i] for i in range(1, 65)]) AS BIGINT)
         |      + CAST(list_sum([$c.qc[i] * $c.qc[i] for i in range(1, 65)]) AS BIGINT)""".stripMargin
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings
       |), qe AS MATERIALIZED (
       |  SELECT vec_id, unnest(q) AS v, unnest(range(0, len(q))) AS pos FROM q
       |), c0 AS (
       |  SELECT CAST(vec_id AS INT) AS cid, q AS qc FROM q WHERE vec_id < 8
       |), a1 AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${distSql("v", "c")}, c.cid) AS r
       |    FROM q v CROSS JOIN c0 c) WHERE r = 1
       |), c1 AS MATERIALIZED (
       |  SELECT cid, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS qc
       |  FROM (SELECT a1.cid, qe.pos, SUM(qe.v) AS s, COUNT(*) AS n
       |        FROM a1 JOIN qe USING (vec_id) GROUP BY a1.cid, qe.pos)
       |  GROUP BY cid
       |), a2 AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${distSql("v", "c")}, c.cid) AS r
       |    FROM q v CROSS JOIN c1 c) WHERE r = 1
       |), c2 AS (
       |  SELECT cid, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS qc
       |  FROM (SELECT a2.cid, qe.pos, SUM(qe.v) AS s, COUNT(*) AS n
       |        FROM a2 JOIN qe USING (vec_id) GROUP BY a2.cid, qe.pos)
       |  GROUP BY cid
       |)""".stripMargin
  }

  val kmeansSql: String =
    s"""WITH $kmeansCteSql
       |SELECT a.cid, COUNT(*) AS n_vecs, MIN(a.vec_id) AS min_vec,
       |  MAX(a.vec_id) AS max_vec, MIN(c2.qc[1]) AS c0
       |FROM a2 a JOIN c2 ON a.cid = c2.cid
       |GROUP BY a.cid ORDER BY a.cid""".stripMargin

  // ----------------------- q118 SemDeDup-style semantic dedup (kmeans + int8)

  /** Quantized-cosine duplicate threshold, in hundredths (0.30). Integer
    * so the keep/drop predicate is exact 64-bit arithmetic in both
    * engines: `cos(a,b) ≥ τ/100` over int8 vectors rewrites (for
    * positive dot) to `10⁴·dot² ≥ τ²·‖a‖²·‖b‖²` — dot ≤ 64·127² ≈ 2²⁰,
    * so every operand stays far below 2⁶³. */
  val SemTauCents = 30L

  /** SemDeDup-style semantic deduplication — the missing tier of the
    * dedup cascade after exact (q20), span (q94) and MinHash (q41):
    * near-duplicate MEANING, not near-duplicate bytes. The classic
    * design (Abbas et al., SemDeDup: k-means the embedding space, then
    * prune pairwise only WITHIN each cluster) makes the quadratic step
    * tractable: pair comparison never crosses a cluster boundary.
    *
    * Composition of two landed primitives: the [[kmeansAssignment]]
    * partition (q75's exact Lloyd trajectory) and q70's int8 scalar
    * quantization + integer-dot kernel. Within each cluster, any pair
    * with quantized cosine ≥ τ marks the HIGHER vec_id as a drop,
    * recording the lowest qualifying partner as `dup_of` — so the kept
    * set is exactly "lowest id of every duplicate family", deterministic
    * with no RNG and no floats anywhere in the decision.
    *
    * Scale shape: the int8 corpus frame is checkpointed once and
    * self-joined on `cid` — an equi-join whose key count is k, so each
    * cluster's pairs materialize inside one partition's hash bucket and
    * the comparison volume is Σₖ mₖ² rather than N². At 100 TB k grows
    * with the corpus (SemDeDup uses k ≈ N/√N style settings) keeping mₖ
    * bounded; k = 8 here only because the oracle must walk the identical
    * trajectory. The int8 payload (64 bytes + one long) is the same 8×
    * bandwidth saving q70 documents. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupAt(spark, dir, 8)

  /** [[semanticDedup]] with a caller-chosen cluster count — the
    * production knob (k grows with the corpus so per-cluster sizes stay
    * bounded); k = 8 is the oracle-locked default. */
  def semanticDedupAt(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val (a2, _) = kmeansAssignment(spark, dir, k)
    val e8 = Tables.embeddings(spark, dir)
      .withColumn("mx", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("q8",
        when(col("mx") === 0.0, transform(col("embedding"), _ => lit(0).cast("byte")))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("mx") * 127.0).cast("byte"))))
      .select(col("vec_id"), col("q8"))
    // one slim frame feeds both sides of the pair join → checkpoint
    val m = a2.join(e8, Seq("vec_id"))
      .withColumn("nsq", graft.functions.ArrayKernels.dotByte(col("q8"), col("q8")))
      .transform(Dist.durableCkpt)
    val lhs = m.select(col("cid"), col("vec_id").as("id_a"),
      col("q8").as("qa"), col("nsq").as("na"))
    val rhs = m.select(col("cid"), col("vec_id").as("id_b"),
      col("q8").as("qb"), col("nsq").as("nb"))
    val dups = lhs.join(rhs, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot8", graft.functions.ArrayKernels.dotByte(col("qa"), col("qb")))
      .filter(col("dot8") > 0 &&
        lit(10000L) * col("dot8") * col("dot8") >=
          lit(SemTauCents * SemTauCents) * col("na") * col("nb"))
    val dropped = dups.groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))
    m.select(col("vec_id"), col("cid"))
      .join(dropped, Seq("vec_id"), "left")
      .withColumn("status", when(col("dup_of").isNotNull, "drop").otherwise("keep"))
      .select(col("vec_id"), col("cid"), col("status"), col("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** Same Lloyd CTE chain as q75's oracle, then the identical int8
    * within-cluster prune in DuckDB integer arithmetic. */
  val semanticDedupSql: String =
    s"""WITH $kmeansCteSql, e8m AS (
       |  SELECT vec_id,
       |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx, embedding
       |  FROM embeddings
       |), e8 AS (
       |  SELECT vec_id,
       |    CASE WHEN mx = 0.0 THEN [CAST(0 AS BIGINT) for x in embedding]
       |         ELSE [CAST(floor(CAST(x AS DOUBLE) / mx * 127.0) AS BIGINT) for x in embedding]
       |    END AS q8
       |  FROM e8m
       |), m AS MATERIALIZED (
       |  SELECT a2.vec_id, a2.cid, e8.q8,
       |    CAST(list_sum([x * x for x in e8.q8]) AS BIGINT) AS nsq
       |  FROM a2 JOIN e8 USING (vec_id)
       |), dups AS (
       |  SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
       |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE CAST(list_sum([a.q8[i] * b.q8[i] for i in range(1, 65)]) AS BIGINT) > 0
       |    AND 10000 * CAST(list_sum([a.q8[i] * b.q8[i] for i in range(1, 65)]) AS BIGINT)
       |          * CAST(list_sum([a.q8[i] * b.q8[i] for i in range(1, 65)]) AS BIGINT)
       |        >= ${SemTauCents * SemTauCents} * a.nsq * b.nsq
       |  GROUP BY b.vec_id
       |)
       |SELECT m.vec_id, m.cid, CASE WHEN d.dup_of IS NOT NULL THEN 'drop' ELSE 'keep' END AS status,
       |  d.dup_of
       |FROM m LEFT JOIN dups d ON m.vec_id = d.vec_id
       |ORDER BY m.vec_id""".stripMargin

  // ------------------------------------------------- q47 per-label centroid

  /** Per-label centroid (first 4 dims) from quantized ints — exact sums,
    * then one double division. posexplode → (label, dim) grouping is the
    * standard distributed centroid shape (shuffle keyed by label×dim). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(quantize(col("embedding"))))
      .filter(col("pos") < 4)
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("col")) / count(lit(1)) / 1048576.0).as("centroid"))
      .orderBy(col("label"), col("pos"))

  val labelCentroidsSql: String =
    """WITH q AS (
      |  SELECT label, unnest([CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding]) AS v,
      |    unnest(range(0, len(embedding))) AS pos
      |  FROM embeddings
      |)
      |SELECT label, CAST(pos AS INT) AS pos, COUNT(*) AS n_vecs,
      |  CAST(SUM(v) AS DOUBLE) / COUNT(*) / 1048576.0 AS centroid
      |FROM q WHERE pos < 4 GROUP BY label, pos ORDER BY label, pos""".stripMargin

  // ------------------------------------ q55 near-dup clusters (connected comps)

  /** Connected components over the verified near-dup pair graph — the step
    * an actual dedup pipeline ends with: pairs say "a duplicates b";
    * clusters say "keep ONE representative per duplicate family" (pairwise
    * drop-the-higher-id, q50's rule, over-deletes when clusters overlap
    * only transitively: a~b, b~c, a≁c still means one family).
    *
    * Algorithm: ONE O(|E|) min-neighbor pass, then iterative min-label
    * propagation on the CONTRACTED label graph.
    *
    * Phase 1 assigns lbl1(v) = min(v, min neighbor(v)) — a single
    * hash-aggregate over the symmetrized edges. Nodes sharing a round-1
    * label are provably in one component, so contracting them to a
    * supernode preserves the component structure exactly (edge
    * contraction within components). The contracted graph has one node
    * per distinct round-1 label and one edge per distinct cross-label
    * pair — for near-dup graphs (dense cliques of mutually-similar docs)
    * that is orders of magnitude smaller than |E|: at sf0.1 the 958k
    * verified doc pairs are already only 28.5k rep-space edges (identical
    * shingle sets collapsed), and those contract to a few hundred
    * supernodes, so the iterative rounds touch thousands of rows instead
    * of millions (round 2 ran every round over the full 1.9M-row
    * symmetrized doc-pair frame; measured q55 7.8s → the loop was ~5s of
    * it, now ~0.4s).
    *
    * Phase 2 is the round-2 loop verbatim, on the contracted graph:
    * min-over-neighbors plus pointer jumping, converged when the global
    * label sum stops changing (labels only ever decrease, so the sum is a
    * monotone convergence witness — one cheap aggregate per round, no
    * change-join). Finally each node's round-1 label is rewritten to its
    * supernode's converged label. The component label is the component's
    * min node id in both formulations (the min node m has lbl1(m) = m),
    * so the output — and the DuckDB oracle — is unchanged.
    *
    * 100 TB notes: phase 1 is one shuffle of the edge set; the label and
    * contracted-edge tables hold only nodes that appear in a near-dup
    * pair — typically a few percent of the corpus — so they are broadcast
    * explicitly (checkpointed frames carry no stats, and without the hint
    * the planner shuffle-joins 2|E| rows: measured 9.2s → 7.6s at sf0.1
    * before contraction). If the duplicate graph itself is huge (label
    * side too big to broadcast), drop the hints and/or swap the loop body
    * for the small-star/large-star rewrite, which bounds per-round
    * degree; the driver holds ONE long per round (the convergence sum),
    * never data.
    *
    * Returns `(grps, groupLabels)`: the checkpointed shingle-group frame
    * and one row per group that belongs to some cluster, `(node = gid,
    * lbl = converged component label)`. Shared by q55 (aggregates the
    * groups without ever expanding members) and q67 (expands members to
    * pick a per-cluster representative doc).
    *
    * Landed ONCE per (session, dir), exactly like q87 lands its bucketed
    * corpus tables: four registered queries (q55/q67/q93/q116) sit on
    * this front-end, and before the memo each re-ran the whole
    * LSH + label-propagation pipeline — so each query's measured time
    * was mostly the shared front-end's, and the family absorbed most of
    * the bench's run-to-run swing. `computeIfAbsent` both dedups the
    * work and SERIALIZES concurrent first calls (a racing second caller
    * blocks until the first finishes building — the iterative loop runs
    * eager actions, so publishing a half-built frame would be a real
    * hazard otherwise). The converged label frame gets one extra lazy
    * checkpoint so later queries read materialized blocks instead of
    * re-executing the union/join assembly. Inputs are immutable session
    * test data; at 100 TB the equivalent step is landing the verified
    * pair graph / component labels as a table ([[graft.io.Layout
    * .ensureBucketed]] with its content fingerprint) rather than a
    * session memo. */
  private val cglMemo =
    new graft.SessionMemo[(SparkSession, String, Option[String]), (DataFrame, DataFrame)]("cluster_labels")

  private[llm] def clusterGroupLabels(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    cglMemo.getOrCompute(memoKey(spark, dir))({ _ =>
      val (grps, labels) = buildClusterGroupLabels(spark, dir)
      (grps, labels.transform(Dist.durableCkpt))
    })

  private val docLabelsMemo =
    new graft.SessionMemo[(SparkSession, String, Option[String]), DataFrame]("doc_labels")

  /** The EXPANDED doc→label frame (lbl, doc_id), landed once per
    * (session, dir, durability regime) and served RUNTIME-SIZE-DECIDED
    * ([[graft.Dist.sizedBroadcast]]): four registered consumers
    * (q67 reps, q93 split keys, q116 top terms, q136 licenses) each
    * re-derived the same groupLabels⋈grps explode per query, then
    * shuffle-joined it onto their corpus scan because the frame grows
    * with the corpus and a broadcast HINT was the banned q218 class
    * (r11). The checkpoint makes its size a measurement: under the bound
    * the attach broadcast-joins (no corpus-side exchange at all), past
    * it the same code keeps the doc_id shuffle join. At 100 TB this
    * lands beside the label table in the bucketed catalog. */
  private[llm] def landedDocLabels(spark: SparkSession, dir: String): DataFrame =
    docLabelsMemo.getOrCompute(memoKey(spark, dir)) { _ =>
      val (grps, groupLabels) = clusterGroupLabels(spark, dir)
      Dist.sizedBroadcast(groupLabels
        .join(grps.select(col("gid").as("node"), col("members")), Seq("node"))
        .select(col("lbl"), explode(col("members")).as("doc_id"))
        .transform(Dist.durableCkpt))
    }

  private def buildClusterGroupLabels(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Per-round LINEAGE TRUNCATION is load-bearing, not just an
    // optimization: labels appears 4× in each round's plan (itself,
    // neighbor join, jump self-join ×2), so without a checkpoint the
    // logical plan grows 4^rounds — the analyzer itself OOMs by round ~8
    // (the DataFrame twin of the DuckDB CTE-inlining trap). Lazy
    // checkpoints keep it one job per round (the convergence action
    // materializes the blocks; the first action also materializes the
    // edge and phase-1 checkpoints, so no round replays LSH). Superseded
    // checkpoint blocks are freed eagerly once their successor is
    // materialized — without that, every invocation stranded one block
    // set per round until GC. `lbl1` and the final `labels` stay alive:
    // the returned (lazy) plan reads them.
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    // sum(lbl) of an empty frame is NULL — an edge-free corpus converges
    // on the first comparison instead of NPE-ing
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("lbl"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    // The graph lives in GROUP-REP space: docs with identical shingle
    // sets are one node (they are mutually connected by construction —
    // jaccard 1 cliques — so contracting them first is exact), and the
    // expansion back to doc counts happens only in the final aggregate.
    // The 958k expanded doc pairs never exist as edges at all.
    val grps = landedShingleGroups(spark, dir)
    val edges = landedRepPairs(spark, dir).select(col("gid_a"), col("gid_b"))
    val sym = edges.select(col("gid_a").as("node"), col("gid_b").as("nbr"))
      .union(edges.select(col("gid_b").as("node"), col("gid_a").as("nbr")))
    // Phase 1: the only O(|E|) aggregate — lbl1(v) = min(v, min nbr(v))
    val lbl1 = sym.groupBy(col("node"))
      .agg(least(col("node"), min(col("nbr"))).as("lbl"))
      .transform(Dist.durableCkpt)
    // Contract: project every edge into label space, keep distinct
    // cross-label edges (within-label edges are already merged)
    val cedges = sym
      .join(broadcast(lbl1.select(col("node"), col("lbl").as("la"))), Seq("node"))
      .join(broadcast(lbl1.select(col("node").as("nbr"), col("lbl").as("lb"))), Seq("nbr"))
      .filter(col("la") =!= col("lb"))
      .select(col("la"), col("lb")).distinct()
      .transform(Dist.durableCkpt)
    val csym = cedges.select(col("la").as("node"), col("lb").as("nbr"))
      .union(cedges.select(col("lb").as("node"), col("la").as("nbr")))
    // Every distinct round-1 label is a supernode, including ones with no
    // cross-label edges (they just keep their own label through the loop)
    var labels = lbl1.select(col("lbl").as("node")).distinct()
      .withColumn("lbl", col("node")).transform(Dist.durableCkpt)
    var prevSum = Long.MinValue
    var curSum = labelSum(labels)
    var rounds = 0
    while (curSum != prevSum && rounds < 25) {
      val viaNbr = csym.join(broadcast(labels.select(col("node").as("nbr"), col("lbl"))), Seq("nbr"))
        .select(col("node"), col("lbl"))
      // pointer jumping: also adopt the label OF the current label (every
      // label is itself a supernode, so the self-join always hits) — path
      // compression that turns O(diameter) rounds into O(log diameter)
      val jump = labels
        .join(labels.select(col("node").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"))
        .select(col("node"), col("lbl2").as("lbl"))
      val next = labels.select(col("node"), col("lbl")).union(viaNbr).union(jump)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .transform(Dist.durableCkpt)
      prevSum = curSum
      curSum = labelSum(next) // materializes next
      checkpointRdd(labels).foreach(_.unpersist(false)) // free superseded blocks
      labels = next
      rounds += 1
    }
    require(curSum == prevSum, s"label propagation did not converge in $rounds rounds")
    // The loop inputs are fully materialized now; the returned plan only
    // reads grps + lbl1 + labels, so the per-invocation cedges blocks can
    // be freed eagerly. `edges` must NOT be freed here: it now reads the
    // session-landed [[landedRepPairs]] checkpoint, which every other
    // consumer (q41/q50/q85/q199…) shares for the process lifetime.
    checkpointRdd(cedges).foreach(_.unpersist(false))
    // Each group adopts its supernode's converged label …
    val inGraph = lbl1.select(col("node"), col("lbl").as("snode"))
      .join(broadcast(labels.select(col("node").as("snode"), col("lbl"))), Seq("snode"))
      .select(col("node"), col("lbl"))
    // … and a multi-doc group with NO cross-set edges is still a cluster
    // (its docs are pairwise near-dups of each other), labeled by itself.
    // Single-doc groups without edges are not in any pair → excluded,
    // matching the doc-space formulation exactly. Token-free docs
    // (hs = []) are excluded too: their pairwise verification is 0/0 →
    // NULL → no edge in the doc-space graph.
    val standalone = grps.filter(size(col("members")) > 1 && size(col("hs")) > 0)
      .join(inGraph.select(col("node")), col("gid") === col("node"), "left_anti")
      .select(col("gid").as("node"), col("gid").as("lbl"))
    (grps, inGraph.union(standalone))
  }

  /** q55 output: one row per cluster with its size and max member —
    * aggregated in GROUP space (member lists summed, never exploded). */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val (grps, groupLabels) = clusterGroupLabels(spark, dir)
    groupLabels
      .join(grps.select(col("gid").as("node"), col("members")), Seq("node"))
      .groupBy(col("lbl").as("cluster_rep"))
      .agg(sum(size(col("members"))).as("n_docs"),
        max(element_at(col("members"), -1)).as("max_doc"))
      .orderBy(col("cluster_rep"))
  }

  // --------------------------------- q200 near-dup cluster-size census

  /** q200: CLUSTER-SIZE SPECTRUM of the near-dup graph — the sanity
    * readout a dedup pipeline checks BEFORE acting on q55/q67: a healthy
    * corpus clusters into small families, while a GIANT component
    * (boilerplate webs and template chains bridging unrelated docs
    * transitively) means "drop everything but the rep" would delete half
    * the corpus in one action. Lee et al. (2022) flag exactly this
    * failure mode for aggressive near-dedup; the spectrum is the number
    * that catches it before the delete.
    *
    * Sizes land in log2 buckets (binary digit count — the q173 idiom,
    * structurally ≤ 64 rows at ANY corpus size, so the share window is
    * bounded by construction of the key, not by data): per bucket the
    * cluster count, clustered-doc count, exact size extremes, and the
    * bucket's share of all clustered docs in basis points.
    *
    * Scale shape: everything downstream of q55's cluster frame (already
    * measured sub-quadratic, SCALING.md) — one ≤64-key aggregate. */
  def clusterSizeCensus(spark: SparkSession, dir: String): DataFrame =
    nearDupClusters(spark, dir)
      .select(col("n_docs").cast("long").as("sz"))
      .groupBy(length(bin(col("sz"))).cast("long").as("size_bucket"))
      .agg(count(lit(1)).cast("long").as("n_clusters"),
        sum(col("sz")).cast("long").as("n_docs"),
        min(col("sz")).cast("long").as("min_size"),
        max(col("sz")).cast("long").as("max_size"))
      .withColumn("share_bp", expr(
        "10000 * n_docs div sum(n_docs) over ()").cast("long"))
      .orderBy(col("size_bucket"))

  lazy val clusterSizeCensusSql: String =
    s"""WITH clusters AS ($nearDupClustersSql),
       |b AS (
       |  SELECT CAST(length(format('{:b}', n_docs)) AS BIGINT) AS size_bucket,
       |    n_docs AS sz
       |  FROM clusters
       |), c AS (
       |  SELECT size_bucket, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |    CAST(SUM(sz) AS BIGINT) AS n_docs,
       |    CAST(MIN(sz) AS BIGINT) AS min_size,
       |    CAST(MAX(sz) AS BIGINT) AS max_size
       |  FROM b GROUP BY 1
       |)
       |SELECT size_bucket, n_clusters, n_docs, min_size, max_size,
       |  CAST(10000 * n_docs // SUM(n_docs) OVER () AS BIGINT) AS share_bp
       |FROM c ORDER BY size_bucket""".stripMargin

  // --------------------------------- q67 per-cluster representative selection

  /** The step that turns clusters into a deduplicated corpus: for each
    * near-dup family, keep exactly ONE representative — the longest
    * document (ties broken by lowest doc_id, so the choice is total and
    * engine-independent). Everything else in the cluster is the "drop"
    * set a curation pipeline deletes.
    *
    * Shape: the cluster labels live in group space (a few percent of the
    * corpus at most — only docs that near-duplicate something); the
    * expanded doc→label table shuffle-joins the slim (doc_id, n_chars)
    * probe on doc_id (it grows with the corpus, so it may not broadcast
    * — the PlanHygiene broadcast-bound rule; the inner join still means
    * only in-cluster docs survive). The rep argmax then runs a window over
    * the in-cluster subset only (|cluster docs| rows, not |corpus|).
    * Doc length comes from the stored `n_chars` column (verified equal to
    * `length(text)` at every SF), so the length probe never reads the
    * text payload at all — the scan's ReadSchema is two slim columns. */
  def clusterRepresentatives(spark: SparkSession, dir: String): DataFrame = {
    val docLabels = landedDocLabels(spark, dir)
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("len"))
    val w = Window.partitionBy(col("lbl")).orderBy(col("len").desc, col("doc_id"))
    lens.join(docLabels, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("lbl"))))
      .filter(col("rk") === 1)
      .select(col("lbl").as("cluster_rep"), col("doc_id").as("rep_doc"),
        col("len").as("rep_len"), col("n_docs"))
      .orderBy(col("cluster_rep"))
  }

  /** Shared unrolled-fixpoint CTE chain for the label-propagation oracles
    * (q55/q67/q93): `rounds` rounds of min-over-neighbors + pointer
    * jumping over `sym`/`lab0`. Each round references the previous 3×, so
    * AS MATERIALIZED is load-bearing (DuckDB CTE inlining would grow
    * 3^rounds subtrees). */
  private def labelRoundCtes(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""lab$i AS MATERIALIZED (
         |  SELECT node, MIN(lbl) AS lbl FROM (
         |    SELECT node, lbl FROM lab${i - 1}
         |    UNION ALL SELECT s.node, l.lbl FROM sym s JOIN lab${i - 1} l ON l.node = s.nbr
         |    UNION ALL SELECT a.node, b.lbl FROM lab${i - 1} a JOIN lab${i - 1} b ON b.node = a.lbl
         |  ) GROUP BY node
         |)""".stripMargin
    }.mkString(", ")

  /** Same fixpoint machinery as [[nearDupClustersSql]] (8 unrolled rounds
    * + poison row on non-convergence), finished with the argmax instead of
    * the aggregate. */
  val clusterRepresentativesSql: String = {
    val rounds = 8
    val roundCtes = labelRoundCtes(rounds)
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), sym AS MATERIALIZED (
       |  SELECT id_a AS node, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), lab0 AS MATERIALIZED (
       |  SELECT DISTINCT node, node AS lbl FROM sym
       |), $roundCtes, r AS (
       |  SELECT l.lbl, l.node AS doc_id, CAST(d.n_chars AS BIGINT) AS len,
       |    ROW_NUMBER() OVER (PARTITION BY l.lbl
       |                       ORDER BY d.n_chars DESC, l.node) AS rk,
       |    COUNT(*) OVER (PARTITION BY l.lbl) AS n_docs
       |  FROM lab$rounds l JOIN documents d ON d.doc_id = l.node
       |)
       |SELECT cluster_rep, rep_doc, rep_len, n_docs FROM (
       |  SELECT lbl AS cluster_rep, doc_id AS rep_doc, len AS rep_len, n_docs
       |  FROM r WHERE rk = 1
       |  UNION ALL
       |  SELECT -1, -1, -1, -1
       |  WHERE EXISTS (SELECT 1 FROM lab$rounds a JOIN lab${rounds - 1} b
       |                ON a.node = b.node WHERE a.lbl <> b.lbl)
       |) ORDER BY cluster_rep""".stripMargin
  }

  /** Oracle with the same FIXPOINT as the Spark side, not the same rounds:
    * a recursive-CTE reachability closure is exact but explodes at
    * |E|×cluster_size per iteration (infeasible already at sf0.1's
    * 958k-pair graph), so the oracle unrolls min-over-neighbors plus
    * pointer jumping for 8 rounds (covers component diameters up to
    * ~2^8). Both sides converge to min-node-id-per-component, so the
    * Spark side's contraction rewrite needs no oracle change. A poison
    * row (-1, -1, -1) is emitted if round 8 differs from round 7, turning
    * any non-convergence into a loud hash mismatch instead of a
    * silently-wrong oracle. */
  val nearDupClustersSql: String = {
    // AS MATERIALIZED is load-bearing: each round references the previous
    // one 3×, so under DuckDB's default CTE inlining the plan would grow
    // 3^rounds subtrees (observed as fd exhaustion from thousands of
    // parquet re-scans); materialization evaluates each round once
    val rounds = 8
    val roundCtes = labelRoundCtes(rounds)
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), sym AS MATERIALIZED (
       |  SELECT id_a AS node, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), lab0 AS MATERIALIZED (
       |  SELECT DISTINCT node, node AS lbl FROM sym
       |), $roundCtes
       |SELECT cluster_rep, n_docs, max_doc FROM (
       |  SELECT lbl AS cluster_rep, COUNT(*) AS n_docs, MAX(node) AS max_doc
       |  FROM lab$rounds GROUP BY lbl
       |  UNION ALL
       |  SELECT -1, -1, -1
       |  WHERE EXISTS (SELECT 1 FROM lab$rounds a JOIN lab${rounds - 1} b
       |                ON a.node = b.node WHERE a.lbl <> b.lbl)
       |) ORDER BY cluster_rep""".stripMargin
  }

  // ------------------------------- q93 leakage-safe train/val/test split

  /** Train/val/test split keyed by NEAR-DUP CLUSTER, not document: q35's
    * content-hash split already keeps exact duplicates together, but two
    * near-identical documents hash differently and can straddle
    * train/eval — the classic eval-contamination leak. Here every doc's
    * split key is its near-dup component label (the component's min
    * doc_id, from the same label-propagation machinery as q55/q67);
    * singleton docs key by their own id. The whole component then lands
    * in ONE split by construction.
    *
    * Shape: the cluster labels live in group space (a few percent of
    * the corpus); the expanded doc→label table shuffle-joins the corpus
    * scan on doc_id, exactly like q67 (corpus-growing frames may not
    * broadcast). The split assignment itself is a stateless hash —
    * reproducible across runs and machines, no RNG, no extra pass. */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docLbl = landedDocLabels(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      graft.functions.TextKernels.tokenCount(col("text")).cast("long").as("n_tokens"))
    val keyed = docs.join(docLbl, Seq("doc_id"), "left")
      .withColumn("skey", coalesce(col("lbl"), col("doc_id")))
    val bucket = pmod(hash60(col("skey").cast("string")), lit(100))
    keyed.withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("skey")).as("n_groups"))
      .orderBy(col("split"))
  }

  /** Oracle: doc-space label fixpoint (shared [[labelRoundCtes]] chain +
    * poison row), then the identical hash-bucket split census. */
  val leakageSafeSplitSql: String = {
    val rounds = 8
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), sym AS MATERIALIZED (
       |  SELECT id_a AS node, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), lab0 AS MATERIALIZED (
       |  SELECT DISTINCT node, node AS lbl FROM sym
       |), ${labelRoundCtes(rounds)}, k AS (
       |  SELECT d.doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(d.text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens,
       |    COALESCE(l.lbl, d.doc_id) AS skey
       |  FROM documents d LEFT JOIN lab$rounds l ON l.node = d.doc_id
       |), s AS (
       |  SELECT skey, n_tokens,
       |    CAST(concat('0x', substr(md5(CAST(skey AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
       |  FROM k
       |)
       |SELECT split, n_docs, n_tokens, n_groups FROM (
       |  SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(DISTINCT skey) AS BIGINT) AS n_groups
       |  FROM s GROUP BY 1
       |  UNION ALL
       |  SELECT 'NONCONVERGED', -1, -1, -1
       |  WHERE EXISTS (SELECT 1 FROM lab$rounds a JOIN lab${rounds - 1} b
       |                ON a.node = b.node WHERE a.lbl <> b.lbl)
       |) ORDER BY split""".stripMargin
  }

  // ------------------------------------ q116 c-TF-IDF terms per cluster

  /** q116: what is each near-dup cluster ABOUT — top-3 salient terms per
    * cluster by class-based TF-IDF (BERTopic's c-TF-IDF, linearized):
    * `score = 1e6 · tf_c(t) · n_classes div total_tf(t)`. Log-free for
    * the same reason as q66/q104 — log is monotone, the integer ratio
    * ranks identically and hash-gates. Composes the two big subsystems:
    * the label-propagation clusters (q55/q67's group-space machinery)
    * supply the classes, the token tier supplies the statistics.
    *
    * Shape: the doc→label table shuffle-joins the corpus scan on
    * doc_id (q67's pattern — in-cluster docs are a few percent of the
    * corpus but GROW with it, so the attach may not broadcast; an inner
    * join means only in-cluster docs tokenize), then one (class, term)
    * hash agg; the per-term total is a window over that aggregated
    * frame and the class count rides in as a broadcast one-row
    * aggregate. */
  def clusterTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docLabels = landedDocLabels(spark, dir)
    val tf = Tables.documents(spark, dir)
      .join(docLabels, Seq("doc_id"))
      .select(col("lbl"), explode(graft.text.TextOps.tokens(lower(col("text")))).as("term"))
      .groupBy(col("lbl"), col("term")).agg(count(lit(1)).as("tf"))
    val nClasses = docLabels.select(col("lbl")).distinct()
      .agg(count(lit(1)).as("n_classes"))
    val wTerm = Window.partitionBy(col("term"))
    val wRank = Window.partitionBy(col("lbl"))
      .orderBy(col("score").desc, col("term"))
    tf.withColumn("term_tf", sum(col("tf")).over(wTerm))
      .crossJoin(broadcast(nClasses))
      .withColumn("score", expr("(1000000 * tf * n_classes) div term_tf"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("lbl").as("cluster_rep"), col("term"), col("tf"),
        col("score"), col("rank"))
      .orderBy(col("cluster_rep"), col("rank"))
  }

  /** Same fixpoint chain as q55/q67/q93, finished with the c-TF-IDF
    * ranking; poison row turns non-convergence into a hash mismatch. */
  val clusterTopTermsSql: String = {
    val rounds = 8
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), sym AS MATERIALIZED (
       |  SELECT id_a AS node, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), lab0 AS MATERIALIZED (
       |  SELECT DISTINCT node, node AS lbl FROM sym
       |), ${labelRoundCtes(rounds)}, tfx AS (
       |  SELECT l.lbl, t.term, COUNT(*) AS tf
       |  FROM lab$rounds l JOIN (
       |    SELECT doc_id,
       |      unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
       |    FROM documents) t ON t.doc_id = l.node
       |  GROUP BY 1, 2
       |), nc AS (SELECT COUNT(DISTINCT lbl) AS n_classes FROM lab$rounds),
       |sc AS (
       |  SELECT lbl, term, tf,
       |    (1000000 * tf * nc.n_classes) // SUM(tf) OVER (PARTITION BY term) AS score
       |  FROM tfx CROSS JOIN nc
       |), rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lbl ORDER BY score DESC, term) AS rank
       |  FROM sc
       |)
       |SELECT cluster_rep, term, tf, score, rank FROM (
       |  SELECT lbl AS cluster_rep, term, CAST(tf AS BIGINT) AS tf,
       |    CAST(score AS BIGINT) AS score, CAST(rank AS INT) AS rank
       |  FROM rk WHERE rank <= 3
       |  UNION ALL
       |  SELECT -1, 'NONCONVERGED', -1, -1, -1
       |  WHERE EXISTS (SELECT 1 FROM lab$rounds a JOIN lab${rounds - 1} b
       |                ON a.node = b.node WHERE a.lbl <> b.lbl)
       |) ORDER BY cluster_rep, rank""".stripMargin
  }

  // -------------------------------- q70 int8 scalar-quantized ANN top-k

  /** Scalar (symmetric per-vector) int8 quantization + integer-dot top-k —
    * the memory-bandwidth scale path for embedding search: each vector
    * stores one double scale plus 64 BYTES (8× less traffic than the
    * long-quantized form q44 scans), and the inner loop is the int8 dot
    * kernel. The score is the RECONSTRUCTED inner product
    * `dot_i · mx_p · mx_c / 127²` — approximate relative to float cosine,
    * but bit-deterministic: quantization is `floor(x / mx · 127)` over
    * correctly-rounded double ops, the dot is exact integer math, and the
    * final rescale is the same three IEEE ops in both engines, so the
    * DuckDB oracle gates every score byte-for-byte.
    *
    * Shape: probes (vec_id < 8) broadcast; the corpus side streams
    * through one codegen'd dot per (probe, vector) pair. At 100 TB the
    * byte payload is the entire point — scan bandwidth, shuffle bytes and
    * cache footprint all shrink 8× vs int64 quantization. */
  def int8AnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("mx", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("q8",
        when(col("mx") === 0.0, transform(col("embedding"), _ => lit(0).cast("byte")))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("mx") * 127.0).cast("byte"))))
      .select(col("vec_id"), col("mx"), col("q8"))
    val probes = broadcast(e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("mx").as("mx_p"), col("q8").as("p8")))
    val scored = e.crossJoin(probes).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("dot_i", graft.functions.ArrayKernels.dotByte(col("p8"), col("q8")))
      .withColumn("est",
        col("dot_i").cast("double") * col("mx_p") * col("mx") / lit(16129.0))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("est").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("dot_i"), col("est"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  val int8AnnTopkSql: String =
    """WITH m AS (
      |  SELECT vec_id, embedding,
      |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx
      |  FROM embeddings
      |), q8 AS (
      |  SELECT vec_id, mx,
      |    CASE WHEN mx = 0.0 THEN [CAST(0 AS BIGINT) for x in embedding]
      |         ELSE [CAST(floor(CAST(x AS DOUBLE) / mx * 127.0) AS BIGINT) for x in embedding]
      |    END AS q
      |  FROM m
      |), pairs AS (
      |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
      |    CAST(list_sum([p.q[i] * e.q[i] for i in range(1, 65)]) AS BIGINT) AS dot_i,
      |    CAST(list_sum([p.q[i] * e.q[i] for i in range(1, 65)]) AS DOUBLE)
      |      * p.mx * e.mx / 16129.0 AS est
      |  FROM q8 p JOIN q8 e ON e.vec_id <> p.vec_id
      |  WHERE p.vec_id < 8
      |), ranked AS (
      |  SELECT probe_id, neighbor_id, dot_i, est,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY est DESC, neighbor_id) AS rnk
      |  FROM pairs
      |)
      |SELECT probe_id, neighbor_id, dot_i, est, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin

  // ------------------------------------------------ q68 incremental dedup

  /** Deduplicate an INCOMING batch against an EXISTING corpus — the shape
    * every recurring ingest needs (yesterday's 100 TB is clean; today's
    * 1 TB crawl must not re-add what it already contains). The split here
    * is deterministic (`doc_id % 10 = 7` plays the incoming batch) so both
    * engines see the same partition.
    *
    * Each incoming doc gets a status:
    *   'exact' — its text occurs verbatim in the corpus;
    *   'near'  — a verified MinHash-LSH match (Jaccard ≥ 0.9) exists in
    *             the corpus;
    *   'kept'  — survives both checks.
    * Exact takes precedence (an exact dup is also a near dup).
    *
    * Scale shape — deliberately ASYMMETRIC, unlike q41's self-join:
    *  - signatures are computed once from one scan and CHECKPOINTED —
    *    the frame feeds seven subtrees (two band sides, two payload
    *    attaches, the exact check's two projections, the final assembly)
    *    and Spark does no plan CSE across join branches, so without the
    *    checkpoint the corpus would be re-scanned and re-hashed per
    *    branch (the same trap [[lshVerifiedPairs]] documents);
    *  - the band join probes the big corpus side with the SMALL incoming
    *    side broadcast (at 100 TB the corpus banded frame is huge but
    *    never shuffles: each corpus partition streams past the broadcast
    *    incoming band keys); the corpus never self-joins at all — the
    *    quadratic part of q41 is gone;
    *  - candidate verification attaches the corpus shingle payload by an
    *    equi-join on the (few) candidate ids, the incoming payload by
    *    broadcast;
    *  - the exact check keeps the same asymmetry: the corpus streams past
    *    the BROADCAST incoming texts (left-semi with the corpus as the
    *    probe side would make the huge corpus the build side), and the
    *    ≤|incoming| matched texts flow back as a second broadcast.
    * The final assembly joins only over the incoming batch. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isIncoming = pmod(col("doc_id"), lit(10)) === 7
    val sigs = docs.select(col("doc_id"), col("text"),
      hashedShingles(col("text")).as("hs"))
      .transform(Dist.durableCkpt)
    val incoming = sigs.filter(isIncoming)
    val corpus = sigs.filter(!isIncoming)
    // Corpus side streams; incoming side broadcasts. Candidates are slim
    // (two ids), then payloads attach: incoming by broadcast, corpus by an
    // equi-join that shuffles only the candidate ids — never the corpus.
    val cand = bandKeys(corpus, "doc_id").withColumnRenamed("doc_id", "cor_id")
      .join(broadcast(bandKeys(incoming, "doc_id").withColumnRenamed("doc_id", "inc_id")),
        Seq("bkey"))
      .select(col("inc_id"), col("cor_id"))
    val nearIds = cand
      .join(broadcast(incoming.select(col("doc_id").as("inc_id"), col("hs").as("hs_i"))),
        Seq("inc_id"))
      .join(corpus.select(col("doc_id").as("cor_id"), col("hs").as("hs_c")), Seq("cor_id"))
      .withColumn("sz_i", size(col("hs_i"))).withColumn("sz_c", size(col("hs_c")))
      .filter(least(col("sz_i"), col("sz_c")) * 10 >= greatest(col("sz_i"), col("sz_c")) * 9)
      .withColumn("n_shared",
        graft.functions.ArrayKernels.sortedIntersectCount(col("hs_i"), col("hs_c")))
      .filter(col("n_shared") / (col("sz_i") + col("sz_c") - col("n_shared")) >= 0.9)
      .select(col("inc_id").as("doc_id")).distinct()
    // corpus texts that occur in the incoming batch: corpus streams past
    // the broadcast incoming texts; survivors are ≤ |incoming| rows
    val matchedTexts = corpus.select(col("text"))
      .join(broadcast(incoming.select(col("text"))), Seq("text"), "left_semi")
      .distinct()
    val exactIds = incoming.select(col("doc_id"), col("text"))
      .join(broadcast(matchedTexts), Seq("text"), "left_semi")
      .select(col("doc_id"))
    incoming.select(col("doc_id"))
      .join(exactIds.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(coalesce(col("is_exact"), lit(false)), "exact")
          .when(coalesce(col("is_near"), lit(false)), "near")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  val incrementalDedupSql: String =
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT i.doc_id AS inc_id, c.doc_id AS cor_id
       |  FROM bands i JOIN bands c ON i.band = c.band AND i.bsig = c.bsig
       |  WHERE i.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
       |), near_ids AS (
       |  SELECT DISTINCT inc_id AS doc_id FROM cand
       |  JOIN sh sa ON sa.doc_id = inc_id JOIN sh sb ON sb.doc_id = cor_id
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), exact_ids AS (
       |  SELECT DISTINCT d.doc_id FROM documents d
       |  WHERE d.doc_id % 10 = 7 AND EXISTS (
       |    SELECT 1 FROM documents c WHERE c.doc_id % 10 <> 7 AND c.text = d.text)
       |)
       |SELECT d.doc_id,
       |  CASE WHEN d.doc_id IN (SELECT doc_id FROM exact_ids) THEN 'exact'
       |       WHEN d.doc_id IN (SELECT doc_id FROM near_ids) THEN 'near'
       |       ELSE 'kept' END AS status
       |FROM documents d WHERE d.doc_id % 10 = 7 ORDER BY d.doc_id""".stripMargin

  // ------------------------------ q87 bucketed-corpus incremental dedup

  /** q68's recurring-ingest shape with the corpus side LANDED, not
    * recomputed: the corpus LSH band table and the corpus signature table
    * are materialized once per (session, dir) as BUCKETED catalog tables
    * ([[graft.io.Layout.ensureBucketed]] — bands bucketed on `bkey`,
    * signatures on `doc_id`), and every subsequent ingest batch probes
    * them directly. This is the actual daily-ingest shape at 100 TB:
    * yesterday's corpus bands are a table on disk; today's 1 TB batch
    * broadcasts its band keys past a SCAN, paying neither the corpus
    * re-hash (q68 recomputes MinHash over the whole corpus per batch) nor
    * any corpus-side exchange — the candidate payload attach reads the
    * signature table bucket-aligned on `doc_id`. Spec-asserted: zero
    * ShuffleExchange anywhere above a corpus-table scan; answers are
    * bit-identical to q68 (same oracle). */
  /** One-time landing of the corpus signature + band tables (the untimed
    * deployment step, like q56/q72), SHARED by q87 and q233 — the two
    * builds must stay byte-identical because [[graft.io.Layout
    * .ensureBucketed]]'s fingerprint keys on the SOURCE files, so
    * whichever query lands first serves the other. Hash the corpus once,
    * then derive the band table FROM the landed signatures so MinHash
    * also runs once. The `th` md5 digest lands WITH the table (r14):
    * the exact-dup probes were re-hashing every corpus text per run and
    * dragging the full `text` column through the scan; a landed digest
    * makes that probe a narrow column scan. */
  private[llm] def landCorpusSigs(spark: SparkSession, dir: String,
      sigsT: String, bandsT: String): Unit = {
    val isIncoming = pmod(col("doc_id"), lit(10)) === 7
    graft.io.Layout.ensureBucketed(spark, sigsT, "doc_id", 16)(
      Tables.documents(spark, dir).filter(!isIncoming)
        .select(col("doc_id"), col("text"), md5(col("text")).as("th"),
          hashedShingles(col("text")).as("hs")))
    graft.io.Layout.ensureBucketed(spark, bandsT, "bkey", 16)(
      bandKeys(spark.table(sigsT).select(col("doc_id"), col("hs")), "doc_id"))
  }

  def bucketedIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val suffix = graft.io.Layout.dirSuffix(dir)
    val sigsT = s"graft_corpus_sigs_$suffix"
    val bandsT = s"graft_corpus_bands_$suffix"
    val isIncoming = pmod(col("doc_id"), lit(10)) === 7
    landCorpusSigs(spark, dir, sigsT, bandsT)
    val corSigs = spark.table(sigsT)
    val corBands = spark.table(bandsT)
    // The recurring path: only the (small) incoming batch is hashed fresh;
    // it feeds several subtrees, so checkpoint like q68 does.
    val incoming = Tables.documents(spark, dir).filter(isIncoming)
      .select(col("doc_id"), col("text"), hashedShingles(col("text")).as("hs"))
      .transform(Dist.durableCkpt)
    // Candidates: the corpus band table STREAMS past the broadcast batch
    // band keys. The verify then broadcasts the (candidate × batch
    // payload) set back over a corpus-signature STREAM — candidates are
    // O(batch × bucket multiplicity), the broadcast regime by design; if
    // a pathological batch outgrew it, the fallback is shuffling the
    // candidates bucket-aligned into corSigs' layout (still zero corpus
    // exchange — that is what the doc_id bucketing is for).
    val cand = corBands.withColumnRenamed("doc_id", "cor_id")
      .join(broadcast(bandKeys(incoming, "doc_id").withColumnRenamed("doc_id", "inc_id")),
        Seq("bkey"))
      .select(col("inc_id"), col("cor_id"))
    // Broadcast the SLIM candidate pairs into the corpus-signature
    // stream, then attach the batch shingle arrays from the batch-sized
    // incoming frame: the r8 shape broadcast (candidates × attached hs_i
    // arrays), whose bytes grow with candidate volume × document length —
    // the BENCH_SF1 10× sweep blew the driver's broadcast budget exactly
    // there. Both build sides are now bounded: pairs are two longs per
    // candidate, and the hs_i attach is the incoming batch itself.
    val nearRaw = corSigs.select(col("doc_id").as("cor_id"), col("hs").as("hs_c"))
      .join(broadcast(cand), Seq("cor_id"))
      .join(broadcast(incoming.select(col("doc_id").as("inc_id"), col("hs").as("hs_i"))),
        Seq("inc_id"))
      .withColumn("sz_i", size(col("hs_i"))).withColumn("sz_c", size(col("hs_c")))
      .filter(least(col("sz_i"), col("sz_c")) * 10 >= greatest(col("sz_i"), col("sz_c")) * 9)
      .withColumn("n_shared",
        graft.functions.ArrayKernels.sortedIntersectCount(col("hs_i"), col("hs_c")))
      .filter(col("n_shared") / (col("sz_i") + col("sz_c") - col("n_shared")) >= 0.9)
      .select(col("inc_id").as("doc_id"))
    // Membership via left_semi against BROADCAST build sides instead of
    // q68's distinct-then-left-join: semi-join output is distinct by
    // construction (incoming doc_ids are unique), the hash build dedups
    // the raw match list, and — the point — no corpus-derived frame ever
    // enters a shuffle exchange.
    val nearIds = incoming.select(col("doc_id"))
      .join(broadcast(nearRaw), Seq("doc_id"), "left_semi")
    // exact probe on the LANDED md5 digest, not the text column: the scan
    // prunes to one 32-char column and the broadcast back carries digests
    // instead of full documents (md5 equality ≡ text equality to the same
    // standard q233's exact screen already accepts)
    val matchedTexts = corSigs.select(col("th"))
      .join(broadcast(incoming.select(md5(col("text")).as("th"))),
        Seq("th"), "left_semi")
    val exactIds = incoming.select(col("doc_id"), md5(col("text")).as("th"))
      .join(broadcast(matchedTexts), Seq("th"), "left_semi")
      .select(col("doc_id"))
    incoming.select(col("doc_id"))
      .join(broadcast(exactIds.withColumn("is_exact", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(nearIds.withColumn("is_near", lit(true))), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(coalesce(col("is_exact"), lit(false)), "exact")
          .when(coalesce(col("is_near"), lit(false)), "near")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  // ------------------------- q203 bucketed-groups near-dup pairs (catalog path)

  /** q203: the q41 near-dup pair pipeline with the shingle-groups frame as
    * a LANDED BUCKETED catalog table — the deployment shape the
    * [[landedShingleGroups]] scaladoc promises ("at 100 TB this is a landed
    * bucketed catalog table, not a session memo") made real and
    * plan-asserted, removing BOTH corpus-growing driver broadcasts from
    * the dedup tier:
    *
    *  - the groups frame lands bucketed on `gid` and its band table lands
    *    bucketed on `bkey` ([[graft.io.Layout.ensureBucketed]], the q87
    *    discipline — one-time landing, content-fingerprint-guarded reuse);
    *  - the band self-join reads the SAME bkey-bucketed table on both
    *    sides → bucket-aligned sort-merge join with ZERO exchange on
    *    either side (the 2.47M-candidate shuffle q41's in-session variant
    *    pays simply does not exist here);
    *  - every groups attach (hs for the verify, members for the
    *    expansion) is a bucket-aligned SMJ on `gid`: the groups side
    *    reads its buckets with no exchange and no driver broadcast —
    *    only the candidate/verified-pair side (∝ true duplicate density,
    *    never ∝ corpus) shuffles into the bucket layout. `merge` hints
    *    are load-bearing twice over: without them the planner would
    *    broadcast the stats-known catalog table (the exact corpus-growing
    *    pattern this query exists to retire), and AQE could demote the
    *    SMJ back to a broadcast at runtime.
    *
    * Answers are bit-identical to q41 (same banding, same verify contract,
    * same expansion algebra), so the oracle is shared — layout changes the
    * plan, not the result. BucketedGroupsSpec walks the executed plan:
    * no groups/bands catalog scan may feed a ShuffleExchange OR a
    * BroadcastExchange. */
  def bucketedNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val suffix = graft.io.Layout.dirSuffix(dir)
    val grpsT = s"graft_groups_$suffix"
    val gbandsT = s"graft_group_bands_$suffix"
    // 16 buckets, re-measured r11: 32 buckets (= the box's cores) saved
    // only ~0.6 s at sf1 (15.3 -> 14.7 isolated min-of-3) while costing
    // ~1 s at sf0.1 (2.2 -> 3.2 in-sweep) in per-bucket overhead -- the
    // join stages are not scan-parallelism-bound; at real scale bucket
    // count follows data volume, not this box
    graft.io.Layout.ensureBucketed(spark, grpsT, "gid", 16)(
      shingleGroups(spark, dir))
    graft.io.Layout.ensureBucketed(spark, gbandsT, "bkey", 16)(
      bandKeys(spark.table(grpsT).select(col("gid"), col("hs")), "gid"))
    val grps = spark.table(grpsT)
    val bands = spark.table(gbandsT)
    // band self-join: two bucket-aligned scans of one table, no exchange
    val cand = bands.select(col("bkey"), col("gid").as("gid_a"))
      .join(bands.select(col("bkey"), col("gid").as("gid_b")).hint("merge"),
        Seq("bkey"))
      .filter(col("gid_a") < col("gid_b"))
      .select(col("gid_a"), col("gid_b"))
    // verify attaches: slim hs only — dedup-after-verify exactly as
    // the r11 rep verify (same re-measured tradeoff), with the distinct
    // running on slim survivors before the members attach
    val verified = cand
      .join(grps.select(col("gid").as("gid_a"), col("hs").as("hs_a")).hint("merge"),
        Seq("gid_a"))
      .join(grps.select(col("gid").as("gid_b"), col("hs").as("hs_b")).hint("merge"),
        Seq("gid_b"))
      .withColumn("sz_a", size(col("hs_a"))).withColumn("sz_b", size(col("hs_b")))
      .filter(least(col("sz_a"), col("sz_b")) * 10 >= greatest(col("sz_a"), col("sz_b")) * 9)
      .withColumn("n_shared",
        graft.functions.ArrayKernels.sortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("jaccard", col("n_shared") / (col("sz_a") + col("sz_b") - col("n_shared")))
      .filter(col("jaccard") >= 0.9)
      .select(col("gid_a"), col("gid_b"), col("n_shared"), col("jaccard"))
      .distinct()
    // doc-space expansion: same algebra as lshVerifiedPairs, members
    // attached via two more bucket-aligned joins (pair side is the
    // verified set — slim) instead of driver broadcasts
    val within = grps.filter(size(col("members")) > 1 && size(col("hs")) > 0)
      .select(size(col("hs")).cast("long").as("n_shared"), col("members"))
      .select(col("n_shared"), explode(col("members")).as("id_a"), col("members"))
      .select(col("id_a"),
        explode(filter(col("members"), m => m > col("id_a"))).as("id_b"),
        col("n_shared"), lit(1.0).as("jaccard"))
    val cross = verified
      .join(grps.select(col("gid").as("gid_a"), col("members").as("ma")).hint("merge"),
        Seq("gid_a"))
      .join(grps.select(col("gid").as("gid_b"), col("members").as("mb")).hint("merge"),
        Seq("gid_b"))
      .select(explode(col("ma")).as("x"), col("mb"), col("n_shared"), col("jaccard"))
      .select(col("x"), explode(col("mb")).as("y"), col("n_shared"), col("jaccard"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("n_shared"), col("jaccard"))
    within.select(col("id_a"), col("id_b"), col("n_shared"), col("jaccard"))
      .union(cross)
      .repartition(1).sortWithinPartitions(col("id_a"), col("id_b"))
  }

  // --------------------------------------- q50 composite training-data pipeline

  /** The flagship composite: the full training-data curation funnel as ONE
    * declarative plan — quality filter (q25's predicate), exact first-
    * occurrence dedup (q20), MinHash-LSH near-dup removal (q41, dropping
    * the higher id of each verified pair), reported as per-stage doc/token
    * counts. Each stage is a flag column on the base corpus and all four
    * stages aggregate in a single conditional-aggregation pass (stack of
    * count/sum-if), so the expensive subtrees execute once. At 100 TB each
    * stage's predicate is exactly the shape benchmarked individually: the
    * funnel adds no new shuffles beyond q41's. */
  def pipelineStats(spark: SparkSession, dir: String): DataFrame = {
    val flagged = curationFlags(spark, dir)
    // ONE conditional-aggregation pass, then stack to rows: round 1 unioned
    // four filtered aggregates, and union branches re-execute common
    // subtrees — the full LSH pipeline ran 4×. Here the scan, the text
    // window and the near-dup join execute exactly once.
    val q = col("quality_ok")
    val f = q && col("is_first")
    val nd = f && col("near_ok")
    flagged.agg(
        count(lit(1)).as("n1"), sum(col("n_tokens")).as("t1"),
        count(when(q, 1)).as("n2"), sum(when(q, col("n_tokens"))).as("t2"),
        count(when(f, 1)).as("n3"), sum(when(f, col("n_tokens"))).as("t3"),
        count(when(nd, 1)).as("n4"), sum(when(nd, col("n_tokens"))).as("t4"))
      .selectExpr(
        """stack(4,
          |  '1_raw', n1, t1,
          |  '2_quality', n2, t2,
          |  '3_exact_dedup', n3, t3,
          |  '4_near_dedup', n4, t4) AS (stage, n_docs, n_tokens)""".stripMargin)
      .orderBy(col("stage"))
  }

  /** The per-doc curation flags q50 aggregates and q85 filters: quality
    * predicate, exact-dedup first-occurrence, near-dup id_b membership —
    * every stage as a flag column on ONE pass over the corpus. */
  private[llm] def curationFlags(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Exact-dedup window keyed on a 128-bit hash of the text, NOT the text:
    // partitioning the exchange on full document payloads shuffles the
    // corpus keyed by multi-KB strings and makes the window sort compare
    // them byte-wise — the one shape here that dies first at 100 TB. Two
    // independent xxhash64 streams (second one salted) give 128 collision
    // bits: for equal hashes to group DIFFERENT texts, a specific pair must
    // collide in both streams (~2^-128), negligible against any corpus
    // size, so min-doc_id-per-text semantics are preserved and the oracle
    // (PARTITION BY text) stays hash-identical. The sort now compares two
    // longs per row; the text rides along as data only.
    val wText = Window.partitionBy(xxhash64(col("text")),
      xxhash64(lit("graft-dedup-salt"), col("text")))
    val base = docs.select(col("doc_id"), col("text"),
        graft.functions.TextKernels.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("len"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          length(col("text"))).as("punct_ratio"))
      .withColumn("quality_ok",
        col("len") >= 40 && col("len") <= 5000 && col("punct_ratio") < 0.2)
      .withColumn("is_first", col("doc_id") === min(col("doc_id")).over(wText))
    // near-dup id_b membership computed in GROUP-REP space (see
    // shingleGroups): doc d in group G is the id_b of some verified pair
    // iff d exceeds the smallest doc_id it is paired against — that is
    // min( {gid_G if |G| ≥ 2}  ∪  {gid_H : H a verified neighbor set} ).
    // One explode over per-group thresholds replaces materializing and
    // deduping the full doc-pair expansion; groups partition docs, so the
    // result is distinct by construction (safe on the left join below).
    // Both edge directions go through ONE generator (no Union — union
    // branches would re-execute the pair pipeline, the exact regression
    // the plan spec locks out).
    val grps = landedShingleGroups(spark, dir)
    val nbrMin = landedRepPairs(spark, dir)
      .select(explode(array(
          struct(col("gid_a").as("g"), col("gid_b").as("n")),
          struct(col("gid_b").as("g"), col("gid_a").as("n")))).as("e"))
      .groupBy(col("e.g").as("g")).agg(min(col("e.n")).as("nbr_min"))
    val none = lit(Long.MaxValue)
    val dupIds = grps
      .join(broadcast(nbrMin), col("gid") === col("g"), "left")
      .select(col("members"),
        // size(hs) > 0: token-free docs verify to NULL jaccard in doc
        // space (0/0), so an empty-set group contributes no within pairs
        least(coalesce(col("nbr_min"), none),
          when(size(col("members")) > 1 && size(col("hs")) > 0, col("gid"))
            .otherwise(none)).as("t"))
      .select(explode(filter(col("members"), m => m > col("t"))).as("doc_id"))
    base.join(dupIds.withColumn("is_dup_b", lit(true)),
        Seq("doc_id"), "left")
      .withColumn("near_ok", coalesce(col("is_dup_b"), lit(false)) === false)
  }

  // ----------------------------------------------- q85 curated corpus output

  /** The funnel's ANSWER, not just its census: the doc_ids that survive
    * quality → exact dedup → near dedup — what actually ships to
    * training. Same flags as q50 (one pass), filtered instead of
    * aggregated; at 100 TB this is the frame you hand to
    * [[graft.io.Sinks.writePackedShards]]. */
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame =
    curationFlags(spark, dir)
      .filter(col("quality_ok") && col("is_first") && col("near_ok"))
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))

  val curatedCorpusSql: String =
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), dup_b AS (
       |  SELECT DISTINCT id_b AS doc_id FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), base AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens,
       |    (length(text) >= 40 AND length(text) <= 5000 AND
       |     length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / length(text) < 0.2) AS quality_ok,
       |    doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_first,
       |    doc_id NOT IN (SELECT doc_id FROM dup_b) AS near_ok
       |  FROM documents
       |)
       |SELECT doc_id, n_tokens FROM base
       |WHERE quality_ok AND is_first AND near_ok
       |ORDER BY doc_id""".stripMargin

  val pipelineStatsSql: String =
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), dup_b AS (
       |  SELECT DISTINCT id_b AS doc_id FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), base AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tokens,
       |    (length(text) >= 40 AND length(text) <= 5000 AND
       |     length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / length(text) < 0.2) AS quality_ok,
       |    doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_first,
       |    doc_id NOT IN (SELECT doc_id FROM dup_b) AS near_ok
       |  FROM documents
       |)
       |SELECT stage, n_docs, n_tokens FROM (
       |  SELECT '1_raw' AS stage, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM base
       |  UNION ALL
       |  SELECT '2_quality', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM base WHERE quality_ok
       |  UNION ALL
       |  SELECT '3_exact_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM base WHERE quality_ok AND is_first
       |  UNION ALL
       |  SELECT '4_near_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM base
       |  WHERE quality_ok AND is_first AND near_ok
       |) ORDER BY stage""".stripMargin

  // ------------------------------------------ q98 embedding Gram matrix

  /** Embedding dimension of the harness `embeddings` table. */
  val EmbDim = 64

  /** q98: the corpus Gram matrix (Xᵀ·X) over int-quantized embeddings —
    * the one-pass second-moment statistic behind covariance/whitening/PCA
    * of an embedding space, computed by the custom mergeable
    * [[graft.functions.GramMatrix]] aggregate: per-partition state is ONE
    * d² long buffer (map-side merged), so the exchange carries
    * d²·partitions longs instead of the d²·rows the declarative
    * unnest-self-join formulation (the oracle) shuffles. Quantization is
    * q70's bit-deterministic int8 scheme widened to long, so every cell
    * is exact integer math and the oracle gates all d² cells. Output:
    * (i, j, s) in row-major order. */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("mx", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("qv",
        when(col("mx") === 0.0, transform(col("embedding"), _ => lit(0L)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("mx") * 127.0).cast("long"))))
    e.agg(graft.functions.GramMatrix.gramLong(col("qv"), EmbDim).as("g"))
      .select(posexplode(col("g")).as(Seq("pos", "s")))
      .select((col("pos") / EmbDim).cast("int").as("i"),
        pmod(col("pos"), lit(EmbDim)).cast("int").as("j"), col("s"))
      .orderBy(col("i"), col("j"))
  }

  val gramMatrixSql: String =
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx
       |  FROM embeddings
       |), q8 AS (
       |  SELECT vec_id,
       |    CASE WHEN mx = 0.0 THEN [CAST(0 AS BIGINT) for x in embedding]
       |         ELSE [CAST(floor(CAST(x AS DOUBLE) / mx * 127.0) AS BIGINT) for x in embedding]
       |    END AS q
       |  FROM m
       |), u AS (
       |  SELECT vec_id, unnest(generate_series(1, $EmbDim)) AS i, unnest(q) AS v FROM q8
       |)
       |SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
       |  CAST(SUM(a.v * b.v) AS BIGINT) AS s
       |FROM u a JOIN u b USING (vec_id)
       |GROUP BY 1, 2 ORDER BY i, j""".stripMargin

  // ------------------------------------------ q99 reciprocal-rank fusion

  /** RRF top-K cutoff per ranked list and final fused top-N. */
  val RrfK = 20
  val RrfTopN = 10

  /** q99: hybrid-retrieval fusion — two keyword rankings per probe doc
    * (raw term-overlap count, and length-normalized Jaccard in scaled
    * integer space) fused by reciprocal-rank: each list contributes
    * `1e6 div (60 + rank)` for its top-[[RrfK]], fused top-[[RrfTopN]]
    * reported. RRF is THE standard way production search fuses dense and
    * sparse retrievers [Cormack et al., SIGIR'09]; every score here is
    * integer arithmetic (scaled-integer Jaccard, integer division for
    * the RRF contribution), so both engines walk identical values and
    * the oracle gates the fusion end-to-end.
    *
    * Shape: the probe set (doc_id < 5) broadcasts past one corpus scan;
    * BOTH scorers compute on the same pair frame in one pass, and all
    * three windows (rank A, rank B, fused rank) partition by probe_id,
    * so one exchange serves the whole ranking stage. At 100 TB the
    * rankings would come from the inverted index (q95) and the ANN tier
    * (q46/q49/q70) — the fusion stage itself is unchanged. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(graft.text.TextOps.tokens(lower(col("text")))).as("toks"))
    val probes = broadcast(base.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("toks").as("ptoks")))
    val pairs = base.filter(col("doc_id") >= 5).crossJoin(probes)
      .withColumn("ov", size(array_intersect(col("ptoks"), col("toks"))).cast("long"))
      .withColumn("uni",
        (size(col("ptoks")) + size(col("toks"))).cast("long") - col("ov"))
      .withColumn("jac_scaled", expr("(1000000 * ov) div uni"))
    val wA = Window.partitionBy(col("probe_id"))
      .orderBy(col("ov").desc, col("doc_id"))
    val wB = Window.partitionBy(col("probe_id"))
      .orderBy(col("jac_scaled").desc, col("doc_id"))
    val wF = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    pairs
      .withColumn("rank_a", row_number().over(wA))
      .withColumn("rank_b", row_number().over(wB))
      .filter(col("rank_a") <= RrfK || col("rank_b") <= RrfK)
      .withColumn("rrf",
        when(col("rank_a") <= RrfK, expr("1000000 div (60 + rank_a)")).otherwise(0L) +
          when(col("rank_b") <= RrfK, expr("1000000 div (60 + rank_b)")).otherwise(0L))
      .withColumn("fused_rank", row_number().over(wF))
      .filter(col("fused_rank") <= RrfTopN)
      .select(col("probe_id"), col("doc_id"), col("rank_a"), col("rank_b"),
        col("rrf"), col("fused_rank"))
      .orderBy(col("probe_id"), col("fused_rank"))
  }

  val rrfFusionSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS toks
       |  FROM documents
       |), pairs AS (
       |  SELECT p.doc_id AS probe_id, c.doc_id AS doc_id,
       |    CAST(len(list_intersect(p.toks, c.toks)) AS BIGINT) AS ov,
       |    CAST(len(p.toks) + len(c.toks) - len(list_intersect(p.toks, c.toks)) AS BIGINT) AS uni
       |  FROM d p JOIN d c ON p.doc_id < 5 AND c.doc_id >= 5
       |), ranked AS (
       |  SELECT probe_id, doc_id, ov, (1000000 * ov) // uni AS jac_scaled,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ov DESC, doc_id) AS rank_a,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY (1000000 * ov) // uni DESC, doc_id) AS rank_b
       |  FROM pairs
       |), scored AS (
       |  SELECT probe_id, doc_id, rank_a, rank_b,
       |    (CASE WHEN rank_a <= $RrfK THEN 1000000 // (60 + rank_a) ELSE 0 END) +
       |    (CASE WHEN rank_b <= $RrfK THEN 1000000 // (60 + rank_b) ELSE 0 END) AS rrf
       |  FROM ranked WHERE rank_a <= $RrfK OR rank_b <= $RrfK
       |), fused AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
       |    ORDER BY rrf DESC, doc_id) AS fused_rank
       |  FROM scored
       |)
       |SELECT probe_id, doc_id, CAST(rank_a AS INT) AS rank_a,
       |  CAST(rank_b AS INT) AS rank_b, CAST(rrf AS BIGINT) AS rrf,
       |  CAST(fused_rank AS INT) AS fused_rank
       |FROM fused WHERE fused_rank <= $RrfTopN
       |ORDER BY probe_id, fused_rank""".stripMargin

  // ------------------------------------ q133 ANN index maintenance

  /** q133: INCREMENTAL ANN-INDEX MAINTENANCE — the operation that keeps
    * q49/q70's IVF index alive on a GROWING corpus: re-clustering 100 TB
    * nightly is a non-starter, so production assigns each new ingest
    * batch to the FROZEN centroids and monitors per-cell growth; only
    * when a cell outgrows its neighbors does a rebuild trigger. The
    * fixture batch is a deterministic drifted cohort (every 5th vector,
    * dims REVERSED — a distribution shift the frozen index did not see),
    * so the oracle derives the identical batch; production swaps in the
    * day's ingest.
    *
    * Shape: the frozen k-row centroid frame broadcasts (the q75
    * whitelist shape); the batch is scanned once through the same
    * integer argmin assignment as Lloyd (min over k struct comparisons,
    * no floats, exact cross-engine); growth is a per-cid count join on
    * k rows. Nothing re-reads the base corpus except the memoized
    * assignment counts. `status` flags cells whose growth exceeds 25%
    * of their base population — the rebuild trigger. */
  val MaintGrowthBp = 2500L

  def indexMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val (a2, c2) = kmeansAssignment(spark, dir)
    val batch = Tables.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(5)) === 3)
      .select((col("vec_id") + 100000L).as("vec_id"),
        reverse(quantize(col("embedding"))).as("q"))
    val assigned = batch.crossJoin(broadcast(c2))
      .withColumn("dist",
        dotQ(col("q"), col("q")) - lit(2L) * dotQ(col("q"), col("qc")) +
          dotQ(col("qc"), col("qc")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m").getField("cid").as("cid"))
    val baseCnt = a2.groupBy(col("cid")).agg(count(lit(1)).as("n_base"))
    val newCnt = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_new"))
    baseCnt.join(newCnt, Seq("cid"), "left")
      .select(col("cid"), col("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("growth_bp", expr("10000 * n_new div n_base"))
      .withColumn("status",
        when(col("growth_bp") > MaintGrowthBp, "rebuild").otherwise("ok"))
      .orderBy(col("cid"))
  }

  val indexMaintenanceSql: String = {
    def distSql(v: String, c: String): String =
      s"""CAST(list_sum([$v.q[i] * $v.q[i] for i in range(1, 65)]) AS BIGINT)
         |      - 2 * CAST(list_sum([$v.q[i] * $c.qc[i] for i in range(1, 65)]) AS BIGINT)
         |      + CAST(list_sum([$c.qc[i] * $c.qc[i] for i in range(1, 65)]) AS BIGINT)""".stripMargin
    s"""WITH $kmeansCteSql,
       |batch AS MATERIALIZED (
       |  SELECT vec_id + 100000 AS vec_id, list_reverse(q) AS q
       |  FROM q WHERE vec_id % 5 = 3
       |), an AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${distSql("v", "c")}, c.cid) AS r
       |    FROM batch v CROSS JOIN c2 c) WHERE r = 1
       |), bc AS (SELECT cid, COUNT(*) AS n_base FROM a2 GROUP BY 1),
       |nc AS (SELECT cid, COUNT(*) AS n_new FROM an GROUP BY 1)
       |SELECT bc.cid, CAST(bc.n_base AS BIGINT) AS n_base,
       |  CAST(COALESCE(nc.n_new, 0) AS BIGINT) AS n_new,
       |  CAST(10000 * COALESCE(nc.n_new, 0) // bc.n_base AS BIGINT) AS growth_bp,
       |  CASE WHEN 10000 * COALESCE(nc.n_new, 0) // bc.n_base > $MaintGrowthBp
       |       THEN 'rebuild' ELSE 'ok' END AS status
       |FROM bc LEFT JOIN nc ON bc.cid = nc.cid
       |ORDER BY bc.cid""".stripMargin
  }

  // ------------------------------- q136 license propagation (dedup families)

  /** q136: LICENSE PROPAGATION through near-duplicate families — the
    * governance consequence of q55's clusters that catalogs miss: if a
    * permissively-licensed document is a near-duplicate of a restricted
    * one, the family shares provenance and the RESTRICTIVE license
    * governs every member ("most restrictive wins"). The fixture
    * license map is a deterministic pure function of the source
    * (`hash60("lic:"++source) mod 3` → 0 permissive / 1 attribution /
    * 2 restricted), so the oracle derives it; production joins its real
    * license table the same way. Output is the 3×3 own→effective
    * transition census — the off-diagonal mass is exactly the
    * contamination a license-filtered training run must re-drop.
    *
    * Shape: the memoized cluster labels (built once per session, shared
    * with q55/q67/q93/q116) attach by doc_id shuffle join (the doc→label
    * frame grows with the corpus, so it may not broadcast); cluster
    * license is one
    * k-row aggregate (max rank per family); singletons keep their own
    * license via the null-label left join. No new corpus scans beyond
    * the one that attaches sources. */
  def licensePropagation(spark: SparkSession, dir: String): DataFrame = {
    val docLabels = landedDocLabels(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(hash60(concat(lit("lic:"), col("source"))), lit(3L)).as("own"))
    val withLbl = docs.join(docLabels, Seq("doc_id"), "left")
    val clusterLic = withLbl.filter(col("lbl").isNotNull)
      .groupBy(col("lbl")).agg(max(col("own")).as("cluster_lic"))
    withLbl.join(broadcast(clusterLic), Seq("lbl"), "left")
      .select(col("own").as("own_license"),
        coalesce(col("cluster_lic"), col("own")).as("final_license"))
      .groupBy(col("own_license"), col("final_license"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("own_license"), col("final_license"))
  }

  /** Same fixpoint chain as q55/q67/q93/q116; poison row on
    * non-convergence. */
  val licensePropagationSql: String = {
    val rounds = 8
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.9
       |), sym AS MATERIALIZED (
       |  SELECT id_a AS node, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), lab0 AS MATERIALIZED (
       |  SELECT DISTINCT node, node AS lbl FROM sym
       |), ${labelRoundCtes(rounds)}, own AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5('lic:' || source), 1, 15)) AS BIGINT) % 3 AS own
       |  FROM documents
       |), cl AS (
       |  SELECT l.lbl, MAX(o.own) AS clic
       |  FROM lab$rounds l JOIN own o ON o.doc_id = l.node GROUP BY 1
       |)
       |SELECT own_license, final_license, n_docs FROM (
       |  SELECT o.own AS own_license, COALESCE(cl.clic, o.own) AS final_license,
       |    COUNT(*) AS n_docs
       |  FROM own o
       |  LEFT JOIN lab$rounds l ON l.node = o.doc_id
       |  LEFT JOIN cl ON cl.lbl = l.lbl
       |  GROUP BY 1, 2
       |  UNION ALL
       |  SELECT -1, -1, CAST(-1 AS BIGINT)
       |  WHERE EXISTS (SELECT 1 FROM lab$rounds a JOIN lab${rounds - 1} b
       |                ON a.node = b.node WHERE a.lbl <> b.lbl)
       |) ORDER BY own_license, final_license""".stripMargin
  }

  // ------------------------------------ q134 embedding outlier audit

  /** q134: EMBEDDING OUTLIER AUDIT — the data-cleaning complement of
    * q118: semantic dedup removes vectors that are too CLOSE; this
    * flags vectors too FAR from every cluster — mislabeled docs,
    * garbage embeddings, encoder failures — the rows a curation pass
    * reviews before training. The audited set is the base corpus plus a
    * deterministic CORRUPTED cohort (every 25th vector scaled ×−3 — an
    * encoder-failure stand-in the oracle re-derives; in production the
    * day's ingest arrives here unlabeled and the audit is what finds
    * the bad rows). Outlier test: squared distance to the vector's own
    * (frozen) centroid exceeds 3× the cluster mean, compared by integer
    * cross-multiplication (`dist·n > 3·Σdist` — no division, no
    * floats; dist ≤ 64·(4·2²⁰)² ≈ 2⁵⁰, so dist·n stays in int64
    * through million-row clusters; beyond that, pre-divide the mean
    * once).
    *
    * Shape: one slim (cid, vec_id, dist) frame — memoized base
    * assignment ∪ the cohort's frozen-centroid argmin (broadcast k-row
    * centroids, the q133 shape) — checkpointed once, then TWO k-row
    * hash aggregates over it (cluster stats, then the outlier count
    * against the broadcast stats). No window, no self-join. */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val (a2, c2) = kmeansAssignment(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
    def distCol = dotQ(col("q"), col("q")) -
      lit(2L) * dotQ(col("q"), col("qc")) + dotQ(col("qc"), col("qc"))
    val base = a2.join(e, Seq("vec_id"))
      .join(broadcast(c2), Seq("cid"))
      .select(col("cid"), col("vec_id"), distCol.as("dist"))
    val corrupted = e.filter(pmod(col("vec_id"), lit(25)) === 7)
      .select((col("vec_id") + 200000L).as("vec_id"),
        transform(col("q"), x => x * lit(-3L)).as("q"))
      .crossJoin(broadcast(c2))
      .withColumn("dist", distCol)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("m").getField("cid").as("cid"), col("vec_id"),
        col("m").getField("dist").as("dist"))
    val d = base.unionByName(corrupted).transform(Dist.durableCkpt)
    val stats = d.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("dist")).cast("long").as("sum_dist"),
        max(col("dist")).cast("long").as("max_dist"))
    val outliers = d.join(broadcast(stats), Seq("cid"))
      .filter(col("dist") * col("n_vecs") > lit(3L) * col("sum_dist"))
      .groupBy(col("cid")).agg(count(lit(1)).as("n_outliers"))
    stats.join(outliers, Seq("cid"), "left")
      .select(col("cid"), col("n_vecs"), col("sum_dist"), col("max_dist"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      .orderBy(col("cid"))
  }

  val embeddingOutliersSql: String = {
    def distSql(v: String, c: String): String =
      s"""CAST(list_sum([$v.q[i] * $v.q[i] for i in range(1, 65)]) AS BIGINT)
         |      - 2 * CAST(list_sum([$v.q[i] * $c.qc[i] for i in range(1, 65)]) AS BIGINT)
         |      + CAST(list_sum([$c.qc[i] * $c.qc[i] for i in range(1, 65)]) AS BIGINT)""".stripMargin
    s"""WITH $kmeansCteSql,
       |corrupt AS MATERIALIZED (
       |  SELECT vec_id + 200000 AS vec_id, [x * -3 for x in q] AS q
       |  FROM q WHERE vec_id % 25 = 7
       |), ca AS (
       |  SELECT cid, vec_id, dist FROM (
       |    SELECT v.vec_id, c.cid, ${distSql("v", "c")} AS dist,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${distSql("v", "c")}, c.cid) AS r
       |    FROM corrupt v CROSS JOIN c2 c) WHERE r = 1
       |), dd AS MATERIALIZED (
       |  SELECT a2.cid, a2.vec_id, ${distSql("v", "c")} AS dist
       |  FROM a2 JOIN q v USING (vec_id) JOIN c2 c ON c.cid = a2.cid
       |  UNION ALL SELECT cid, vec_id, dist FROM ca
       |), st AS MATERIALIZED (
       |  SELECT cid, COUNT(*) AS n_vecs, SUM(dist) AS sum_dist,
       |    MAX(dist) AS max_dist
       |  FROM dd GROUP BY 1
       |), o AS (
       |  SELECT dd.cid, COUNT(*) AS n_outliers
       |  FROM dd JOIN st USING (cid)
       |  WHERE dd.dist * st.n_vecs > 3 * st.sum_dist
       |  GROUP BY 1
       |)
       |SELECT st.cid, CAST(st.n_vecs AS BIGINT) AS n_vecs,
       |  CAST(st.sum_dist AS BIGINT) AS sum_dist,
       |  CAST(st.max_dist AS BIGINT) AS max_dist,
       |  CAST(COALESCE(o.n_outliers, 0) AS BIGINT) AS n_outliers
       |FROM st LEFT JOIN o ON o.cid = st.cid
       |ORDER BY st.cid""".stripMargin
  }

  // --------------------------------- q129 MMR diverse exemplar selection

  /** MMR geometry, all integer: λ = 0.7 split as 7·rel − 3·maxsim with
    * relevance pre-stretched ×100 so both terms land in comparable
    * ranges (|rel| ≤ 64·127 → ≤ 5.7e6 weighted; |sim| ≤ 1e6 → ≤ 3e6
    * weighted). cos² is carried in millionths: 10⁶·dot² ≤ 10⁶·2⁴⁰ ≈
    * 1.1e18 < 2⁶³, the largest intermediate anywhere. */
  val MmrK = 6
  val MmrLamNum = 7L
  val MmrLamCmp = 3L
  val MmrSimScale = 1000000L
  val MmrRelScale = 100L

  /** q129: MMR (maximal-marginal-relevance) exemplar selection — the
    * EVAL-SET diversifier: q124 draws a stratified sample, but a probe
    * set for similarity-heavy evaluation wants exemplars that are
    * relevant AND mutually dissimilar. Greedy MMR (Carbonell &
    * Goldstein '98): repeatedly pick argmax of
    * λ·relevance − (1−λ)·max_sim(candidate, selected).
    *
    * Everything is integer so the trajectory hash-gates: vectors are
    * q118's int8 quantization, relevance is the int8 dot with the
    * all-ones probe direction (a stand-in for a retrieval score), and
    * similarity is signed fixed-point cos² — sign(dot)·(10⁶·dot² div
    * (‖a‖²·‖b‖²)), a monotone proxy for cosine with no sqrt and no
    * floats, exactly divisible identically in both engines (numerator
    * and denominator are non-negative at the div).
    *
    * Scale shape: greedy MMR is inherently K sequential rounds; each
    * round here is ONE distributed pass (per-row codegen dot kernels
    * against the ≤K-row broadcast selected set, then a TakeOrdered
    * argmax — no shuffle, no join). The candidate frame is checkpointed
    * once and re-read per round. K and the selected-set state are
    * bounded and tiny (K·64 bytes) — the standard driver-held iterative
    * state, same regime as the Lloyd rounds. In production the
    * candidate pool is the ANN shortlist (q49/q70), not the full
    * corpus. Oracle unrolls the identical K rounds. */
  def mmrSelection(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ArrayKernels.dotByte
    val ones = typedlit(Seq.fill(64)(1.toByte))
    val cand = Tables.embeddings(spark, dir)
      .withColumn("mx", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("q8",
        when(col("mx") === 0.0, transform(col("embedding"), _ => lit(0).cast("byte")))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("mx") * 127.0).cast("byte"))))
      .select(col("vec_id"), col("q8"),
        dotByte(col("q8"), col("q8")).cast("long").as("nsq"),
        dotByte(col("q8"), ones).cast("long").as("rel"))
      .transform(Dist.durableCkpt)

    case class Sel(rnk: Int, vecId: Long, q8: Seq[Byte], nsq: Long,
                   rel: Long, maxsim: Long, mmr: Long)
    var selected = Vector.empty[Sel]
    while (selected.size < MmrK) {
      val base =
        if (selected.isEmpty) cand.withColumn("maxsim", lit(0L))
        else {
          val withDots = selected.zipWithIndex.foldLeft(
            cand.filter(!col("vec_id").isin(selected.map(_.vecId): _*))) {
            case (df, (s, i)) =>
              df.withColumn(s"dot_$i",
                dotByte(col("q8"), typedlit(s.q8)).cast("long"))
          }
          val sims = selected.zipWithIndex.map { case (s, i) =>
            expr(
              s"""CASE WHEN nsq * ${s.nsq}L = 0 THEN 0L
                 |WHEN dot_$i < 0 THEN -(($MmrSimScale * dot_$i * dot_$i) div (nsq * ${s.nsq}L))
                 |ELSE ($MmrSimScale * dot_$i * dot_$i) div (nsq * ${s.nsq}L) END""".stripMargin)
          }
          withDots.withColumn("maxsim", sims.reduce((a, b) => greatest(a, b)))
        }
      val picked = base
        .withColumn("mmr",
          lit(MmrLamNum * MmrRelScale) * col("rel") - lit(MmrLamCmp) * col("maxsim"))
        .orderBy(col("mmr").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("q8"), col("nsq"), col("rel"),
          col("maxsim"), col("mmr"))
        .head()
      selected :+= Sel(selected.size + 1, picked.getLong(0),
        picked.getSeq[Byte](1), picked.getLong(2), picked.getLong(3),
        picked.getLong(4), picked.getLong(5))
    }
    import spark.implicits._
    selected.map(s => (s.rnk, s.vecId, s.rel, s.maxsim, s.mmr))
      .toDF("rnk", "vec_id", "rel", "maxsim", "mmr")
      .orderBy(col("rnk"))
  }

  val mmrSelectionSql: String = {
    val w = MmrLamNum * MmrRelScale
    def dotExpr(a: String, b: String) =
      s"CAST(list_sum([$a.q8[i] * $b.q8[i] for i in range(1, 65)]) AS BIGINT)"
    def round(j: Int): String =
      s"""d$j AS (
         |  SELECT c.vec_id, c.q8, c.nsq, c.rel, s.nsq AS snsq,
         |    ${dotExpr("c", "s")} AS dot
         |  FROM cand c, sel${j - 1} s
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${j - 1} x WHERE x.vec_id = c.vec_id)
         |), p$j AS (
         |  SELECT vec_id, q8, nsq, rel,
         |    MAX(CASE WHEN nsq * snsq = 0 THEN 0
         |             WHEN dot < 0 THEN -(($MmrSimScale * dot * dot) // (nsq * snsq))
         |             ELSE ($MmrSimScale * dot * dot) // (nsq * snsq) END) AS maxsim
         |  FROM d$j GROUP BY vec_id, q8, nsq, rel
         |), s$j AS MATERIALIZED (
         |  SELECT vec_id, q8, nsq, rel, maxsim,
         |    $w * rel - $MmrLamCmp * maxsim AS mmr, $j AS rnk
         |  FROM p$j
         |  ORDER BY $w * rel - $MmrLamCmp * maxsim DESC, vec_id LIMIT 1
         |), sel$j AS MATERIALIZED (
         |  SELECT vec_id, q8, nsq FROM sel${j - 1}
         |  UNION ALL SELECT vec_id, q8, nsq FROM s$j
         |)"""
    val rounds = (2 to MmrK).map(round).mkString(",\n")
    val unions = (1 to MmrK)
      .map(j => s"SELECT rnk, vec_id, rel, maxsim, mmr FROM s$j")
      .mkString("\n  UNION ALL ")
    s"""WITH cand AS MATERIALIZED (
       |  SELECT vec_id, q8,
       |    CAST(list_sum([x * x for x in q8]) AS BIGINT) AS nsq,
       |    CAST(list_sum(q8) AS BIGINT) AS rel
       |  FROM (
       |    SELECT vec_id,
       |      CASE WHEN mx = 0.0 THEN [CAST(0 AS BIGINT) for x in embedding]
       |           ELSE [CAST(floor(CAST(x AS DOUBLE) / mx * 127.0) AS BIGINT) for x in embedding]
       |      END AS q8
       |    FROM (SELECT vec_id,
       |            list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx,
       |            embedding
       |          FROM embeddings)
       |  )
       |), s1 AS MATERIALIZED (
       |  SELECT vec_id, q8, nsq, rel, CAST(0 AS BIGINT) AS maxsim,
       |    $w * rel AS mmr, 1 AS rnk
       |  FROM cand ORDER BY $w * rel DESC, vec_id LIMIT 1
       |), sel1 AS MATERIALIZED (
       |  SELECT vec_id, q8, nsq FROM s1
       |),
       |$rounds
       |SELECT CAST(rnk AS INT) AS rnk, vec_id, CAST(rel AS BIGINT) AS rel,
       |  CAST(maxsim AS BIGINT) AS maxsim, CAST(mmr AS BIGINT) AS mmr
       |FROM (
       |  $unions
       |) ORDER BY rnk""".stripMargin
  }

  // ------------------------------------------- q143 containment (subset) dedup

  /** Distinct 3-gram shingle set, 60-bit-hashed and sorted — the
    * granularity for CONTAINMENT, where the unigram sets are too dense
    * (this corpus's 31-word vocabulary makes almost every unigram set
    * near-contained in almost every other; word trigrams are
    * discriminative). Computed by the fused kernel
    * ([[graft.functions.SketchKernels.wordGram3Hash60]]): one compiled
    * pass per row, each token's bytes md5-composed directly — replacing
    * the interpreted per-gram lambda∘concat∘md5→hex→conv chain that made
    * the trigram-postings landing the system's single largest cost
    * (255 s at sf1, r12 `landings`). Bit-identical to [[gram3HashedHof]]
    * (spec-asserted), so every downstream oracle hash is unchanged; an
    * inline `tokens(...)` argument is now fine (the kernel evaluates its
    * child once per row — the nested-HOF re-evaluation trap was a
    * property of the lambda form). Public for the streaming containment
    * gate: one shingling definition, so batch and stream cannot silently
    * disagree. */
  def gram3Hashed(t: Column): Column =
    // coalesce preserves the HOF form's NULL-input → empty-array contract
    // (when(null >= 3) falls to otherwise); the kernel itself is
    // NULL-propagating like every UnaryExpression
    coalesce(graft.functions.SketchKernels.wordGram3Hash60(t, P),
      array().cast("array<long>"))

  /** The pre-kernel HOF formulation — the semantic definition the fused
    * kernel must match; kept for the bit-identity regression spec
    * (SketchKernelsSpec), the [[hashedShinglesHof]] pattern. */
  def gram3HashedHof(t: Column): Column =
    when(size(t) >= 3,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(t) - 2),
        i => pmod(hash60(concat_ws(" ",
          element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))), lit(P))))))
      .otherwise(array().cast("array<long>"))

  /** q143: containment near-dup pairs — ordered pairs (A, B) where ≥ 90%
    * of A's trigram shingles appear in B. The ASYMMETRIC relation the
    * Jaccard tier (q41) is blind to: a doc fully contained in a much
    * longer one has low symmetric Jaccard (|A|/|B|) but containment ≈ 1 —
    * truncated crawls, quote-embedding pages, prefix-duplicated shards.
    *
    * Candidate generation is EXACT prefix filtering (the PPJoin family),
    * not LSH: with minshared = ⌈0.9·|A|⌉, any B containing A at ≥ 0.9
    * must hit at least one of A's K = |A| − minshared + 1 prefix
    * shingles (pigeonhole), so indexing each set's K globally-RAREST
    * shingles (order by document frequency — a correctness-free choice
    * that minimizes candidates) against the full posting lists loses
    * NOTHING. The DuckDB oracle verifies that exactness claim by brute
    * force over all group pairs.
    *
    * Scale shape: sets collapse to distinct-set rep space first (the q41
    * discipline); the checkpoint makes the groups aggregate ONE
    * materialization serving postings, prefixes and both attaches; df
    * and the prefix rank are hash/window exchanges on h and gid; the
    * candidate join is equi on h and carries only ids; arrays attach
    * by runtime-size-decided gid joins AFTER the candidate distinct
    * ([[graft.Dist.sizedBroadcast]]: the rep frame is corpus-growing, so
    * an unconditional hint may not claim it — measured under the bound
    * it broadcasts, past it the gid shuffle joins carry the arrays
    * once). Output stays in rep space
    * (gid = min doc_id of the identical-set group) — bounded, and
    * expandable to doc pairs exactly as lshVerifiedPairs documents. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val sets = containmentSets(spark, dir)
    // runtime-size-decided attach (Dist.sizedBroadcast over the already-
    // checkpointed rep frame): measured under the bound -> broadcast,
    // past it -> the gid shuffle joins described above
    val sized = graft.Dist.sizedBroadcast(
      sets.select(col("gid"), col("hs"), col("sz")))
    containmentCandidates(sets)
      .join(sized.select(col("gid").as("gid_a"),
        col("hs").as("hs_a"), col("sz").as("sz_a")), Seq("gid_a"))
      .join(sized.select(col("gid").as("gid_b"),
        col("hs").as("hs_b"), col("sz").as("sz_b")), Seq("gid_b"))
      .filter(lit(10) * col("sz_b") >= lit(9) * col("sz_a"))
      .withColumn("n_shared", graft.functions.ArrayKernels
        .sortedIntersectCount(col("hs_a"), col("hs_b")).cast("long"))
      .filter(lit(10) * col("n_shared") >= lit(9) * col("sz_a"))
      .withColumn("containment_bp", expr("10000 * n_shared div sz_a"))
      .select(col("gid_a"), col("gid_b"), col("sz_a"), col("sz_b"),
        col("n_shared"), col("containment_bp"))
      .repartition(1).sortWithinPartitions(col("gid_a"), col("gid_b"))
  }

  /** q143's rep-space shingle-set frame (gid, hs, sz), checkpointed once
    * — serves postings, prefixes and both verify attaches. fanOut BEFORE
    * the trigram hashing: higher-order functions are CodegenFallback
    * (interpreted), so the ~52 md5 hashes per doc are exactly the
    * per-row-compute ≫ per-row-bytes case Dist.fanOut documents — on the
    * harness's one-row-group scan the chain otherwise runs on ONE core
    * (measured 8.7s at sf0.1; 0.6s fanned out). No size-filter on hs: an
    * empty set forms no prefix and no posting, so it can never pair —
    * and an explicit filter would be pushed down by alias substitution,
    * re-evaluating the whole hash chain per row. */
  private[llm] def containmentSets(spark: SparkSession, dir: String): DataFrame =
    graft.Dist.fanOut(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("hs", gram3Hashed(col("t")))
      .groupBy(col("hs")).agg(min(col("doc_id")).as("gid"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .transform(graft.Dist.durableCkpt)

  /** q143's PPJoin prefix-filter candidate stage: each set's K rarest
    * shingles (K = sz − ⌈0.9·sz⌉ + 1, pigeonhole-exact) probe the full
    * posting lists; output is the DISTINCT (gid_a, gid_b) candidate set
    * the verify then scores. Exposed separately so the scaling
    * measurement (ScalingSpec/ScalingBench) can count candidates — the
    * quantity whose sub-quadratic growth IS the 100 TB claim. */
  private[llm] def containmentCandidates(sets: DataFrame): DataFrame = {
    val tok = sets.select(col("gid"), col("sz"), explode(col("hs")).as("h"))
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefixes = tok.join(dfreq, Seq("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("gid")).orderBy(col("df"), col("h"))))
      .filter(col("rn") <= col("sz") - expr("(9 * sz + 9) div 10") + 1)
      .select(col("gid").as("gid_a"), col("h"))
    prefixes
      .join(tok.select(col("gid").as("gid_b"), col("h")), Seq("h"))
      .filter(col("gid_a") =!= col("gid_b"))
      .select(col("gid_a"), col("gid_b")).distinct()
  }

  val containmentPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, list_sort(list_distinct(
       |    [CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15)) AS BIGINT) % $P
       |     for i in range(1, len(t) - 1)])) AS hs
       |  FROM toks WHERE len(t) >= 3
       |), g AS MATERIALIZED (
       |  SELECT hs, MIN(doc_id) AS gid, CAST(len(hs) AS BIGINT) AS sz
       |  FROM sh WHERE len(hs) > 0 GROUP BY hs
       |)
       |SELECT a.gid AS gid_a, b.gid AS gid_b, a.sz AS sz_a, b.sz AS sz_b,
       |  CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS n_shared,
       |  10000 * CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) // a.sz AS containment_bp
       |FROM g a JOIN g b ON a.gid <> b.gid AND 10 * b.sz >= 9 * a.sz
       |WHERE 10 * len(list_intersect(a.hs, b.hs)) >= 9 * a.sz
       |ORDER BY gid_a, gid_b""".stripMargin

  // ---------------------------------------------- q147 LSH tuning S-curve

  /** q147: the measured LSH S-curve — for every candidate pair surfaced
    * by the q41 banding (8 bands × 8 rows), how many bands matched (k),
    * and what fraction of the pairs at each k verify as true near-dups
    * (exact Jaccard ≥ 0.9)? This is the tuning table behind the
    * Bands/RowsPerBand choice: precision rising steeply with k is the
    * S-curve working; flat precision means the banding is mis-sized for
    * the corpus's similarity distribution. q131 plays this "measure,
    * don't guess" role for skew; this plays it for the dedup tier.
    *
    * Band keys here are the EXACT signature slices rendered to strings
    * (`array_join(slice, ',')`), not q41's xxhash64 of them: the census
    * counts matching bands per pair, where a hash collision would
    * silently inflate k — and DuckDB has no xxhash64, so exact slices
    * are also what lets the oracle reproduce the count bit-for-bit.
    * (q41 itself keeps the hashed key: there a collision only ADDS a
    * candidate that exact verification then scores.)
    *
    * Scale shape: rep-space sets (the q41 collapse) → signatures → 8
    * band-key rows per set; the self-join is equi on (band, key); the
    * per-pair k is one hash aggregate over the slim candidate stream;
    * arrays attach broadcast to the DISTINCT pairs only; the verify is
    * the integer cross-multiplied Jaccard (10·∩ ≥ 9·∪ — no 0.9 double).
    * Output is ≤ Bands rows. */
  def lshTuningCurve(spark: SparkSession, dir: String): DataFrame = {
    // fanOut BEFORE the re-checkpoint: the landed groups frame is a
    // materialized checkpoint, so fanOut's partition test reads its REAL
    // count — AQE's byte-based coalescing had frozen it near one
    // partition (~12 MB), which serialized the 64-perm signature +
    // band-explode recompute below onto one core (measured 2.1
    // task-seconds single-task per rep, the query's top stage; guide
    // §2.5/§2.6 — bytes are the wrong parallelism proxy when per-row
    // compute dominates). No-op at cluster scale where the landed frame
    // already carries ≥ parallelism partitions.
    val grps = graft.Dist.fanOut(
        landedShingleGroups(spark, dir).select(col("gid"), col("hs"))
          .filter(size(col("hs")) > 0))
      .transform(graft.Dist.durableCkpt)
    val bandk = grps
      .withColumn("sig", minhashSignature(col("hs")))
      .select(col("gid"), posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)))))
      .select(col("gid"), col("pos"), array_join(col("col"), ",").as("bkey"))
    val cand = bandk.select(col("pos"), col("bkey"), col("gid").as("gid_a"))
      .join(bandk.select(col("pos"), col("bkey"), col("gid").as("gid_b")),
        Seq("pos", "bkey"))
      .filter(col("gid_a") < col("gid_b"))
      .groupBy(col("gid_a"), col("gid_b")).agg(count(lit(1)).as("k"))
    cand
      .join(grps.select(col("gid").as("gid_a"), col("hs").as("hs_a")),
        Seq("gid_a"))
      .join(grps.select(col("gid").as("gid_b"), col("hs").as("hs_b")),
        Seq("gid_b"))
      .withColumn("inter", graft.functions.ArrayKernels
        .sortedIntersectCount(col("hs_a"), col("hs_b")).cast("long"))
      .withColumn("uni",
        size(col("hs_a")).cast("long") + size(col("hs_b")) - col("inter"))
      .withColumn("dup", (lit(10) * col("inter") >= lit(9) * col("uni")).cast("int"))
      .groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("dup")).cast("long").as("n_dup"))
      .withColumn("precision_bp", expr("10000 * n_dup div n_pairs"))
      .orderBy(col("k"))
  }

  val lshTuningCurveSql: String =
    s"""WITH $sigCteSql,
       |gg AS MATERIALIZED (
       |  -- group by the SORTED set: sh's hs preserves first-seen order, so
       |  -- equal sets from different docs would otherwise split groups
       |  SELECT list_sort(hs) AS hs, MIN(doc_id) AS gid
       |  FROM sh WHERE len(hs) > 0 GROUP BY list_sort(hs)
       |), gth AS (
       |  SELECT gid, unnest(hs) AS h FROM gg
       |), gsigs AS (
       |  SELECT gid, i, MIN((a * h + b) % $P) AS sig
       |  FROM gth CROSS JOIN perms GROUP BY gid, i
       |), bandk AS MATERIALIZED (
       |  SELECT gid, i // ${RowsPerBand} AS band,
       |    string_agg(sig, ',' ORDER BY i) AS bkey
       |  FROM gsigs GROUP BY 1, 2
       |), cand AS (
       |  SELECT a.gid AS ga, b.gid AS gb, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM bandk a JOIN bandk b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.gid < b.gid
       |  GROUP BY 1, 2
       |), ver AS (
       |  SELECT c.k, len(list_intersect(x.hs, y.hs)) AS inter,
       |    len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)) AS uni
       |  FROM cand c JOIN gg x ON x.gid = c.ga JOIN gg y ON y.gid = c.gb
       |)
       |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN 10 * inter >= 9 * uni THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  10000 * CAST(SUM(CASE WHEN 10 * inter >= 9 * uni THEN 1 ELSE 0 END) AS BIGINT)
       |    // CAST(COUNT(*) AS BIGINT) AS precision_bp
       |FROM ver GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------- q145 cross-modal purity audit

  /** q145: cross-modal cluster purity — for every embedding label (the
    * vector-space cluster id the harness ships), how concentrated are the
    * joined documents' METADATA fields (lang, source)? The
    * representation-quality audit run before trusting embedding clusters
    * for curation (q118/q129/q116 all consume them): labels that mix
    * languages/sources at random (purity ≈ uniform share) mean the
    * embedding space does not encode that metadata — using it for
    * language-targeted pruning would be noise.
    *
    * Shape: ONE join of the two modality tables on the shared id, ONE
    * (label, lang, source) hash aggregate; both per-field majorities and
    * totals derive from that tiny partial frame (map-side combined), so
    * raw rows are touched once. The majority-with-tie-break is
    * `min(struct(-n, field))` — max count, then lexicographic min —
    * no window, no second shuffle. All emitted numbers are integers
    * (`10000·top div total` basis points). */
  def crossmodalPurity(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
    val part = j.groupBy(col("label"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    val byLang = part.groupBy(col("label"), col("lang"))
      .agg(sum(col("n")).as("n"))
    val bySource = part.groupBy(col("label"), col("source"))
      .agg(sum(col("n")).as("n"))
    val langTop = byLang.groupBy(col("label"))
      .agg(sum(col("n")).cast("long").as("n_vecs"),
        min(struct((-col("n")).as("negn"), col("lang").as("f"))).as("m"))
      .select(col("label"), col("n_vecs"), col("m.f").as("top_lang"),
        (-col("m.negn")).cast("long").as("top_lang_n"))
    val srcTop = bySource.groupBy(col("label"))
      .agg(min(struct((-col("n")).as("negn"), col("source").as("f"))).as("m"))
      .select(col("label"), col("m.f").as("top_source"),
        (-col("m.negn")).cast("long").as("top_source_n"))
    langTop.join(srcTop, Seq("label"))
      .withColumn("lang_purity_bp", expr("10000 * top_lang_n div n_vecs"))
      .withColumn("source_purity_bp", expr("10000 * top_source_n div n_vecs"))
      .select(col("label"), col("n_vecs"), col("top_lang"), col("top_lang_n"),
        col("lang_purity_bp"), col("top_source"), col("top_source_n"),
        col("source_purity_bp"))
      .orderBy(col("label"))
  }

  val crossmodalPuritySql: String =
    """WITH j AS (
      |  SELECT e.label, d.lang, d.source
      |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
      |), p AS (
      |  SELECT label, lang, source, COUNT(*) AS n FROM j GROUP BY 1, 2, 3
      |), l AS (
      |  SELECT label, lang, SUM(n) AS n FROM p GROUP BY 1, 2
      |), s AS (
      |  SELECT label, source, SUM(n) AS n FROM p GROUP BY 1, 2
      |), lt AS (
      |  SELECT label, lang, n,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY n DESC, lang) AS rn
      |  FROM l
      |), st AS (
      |  SELECT label, source, n,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY n DESC, source) AS rn
      |  FROM s
      |), tot AS (
      |  SELECT label, CAST(SUM(n) AS BIGINT) AS n_vecs FROM l GROUP BY 1
      |)
      |SELECT t.label, t.n_vecs, lt.lang AS top_lang, CAST(lt.n AS BIGINT) AS top_lang_n,
      |  10000 * CAST(lt.n AS BIGINT) // t.n_vecs AS lang_purity_bp,
      |  st.source AS top_source, CAST(st.n AS BIGINT) AS top_source_n,
      |  10000 * CAST(st.n AS BIGINT) // t.n_vecs AS source_purity_bp
      |FROM tot t
      |JOIN lt ON lt.label = t.label AND lt.rn = 1
      |JOIN st ON st.label = t.label AND st.rn = 1
      |ORDER BY t.label""".stripMargin

  // ------------------------------------------------ q139 ANN recall audit

  /** q139: recall@3 of BOTH approximate indexes against the exact answer —
    * the evaluation harness that decides whether an ANN index is good
    * enough to replace the brute-force path. Per probe: how many of the
    * exact cosine top-3 (q44's baseline, cut at rank 3) does the
    * hyperplane-LSH index (q46) return, and how many does the IVF index
    * (q49)? Recall in integer basis points (`10000·hits div 3` — the
    * div idiom, no floats), so the full audit hash-gates.
    *
    * This is the missing third leg of the ANN tier: q44 is ground truth,
    * q46/q49 are the scale paths, and nothing previously MEASURED the
    * approximation. At 100 TB the exact leg runs on a sampled probe set
    * exactly like this one (8 broadcast probes); the audit's own joins
    * see only the k·|probes| result rows, so its cost is the three
    * underlying searches, nothing more.
    *
    * Expected result on this corpus, locked by the spec: LSH recall is
    * WELL below 10000 for some probes (6 hyperplanes over near-orthogonal
    * synthetic vectors split true neighbors across buckets) while IVF
    * recall is higher (label-aligned cells) — the audit exists precisely
    * to surface that difference. */
  def annRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopk(spark, dir).filter(col("rnk") <= 3)
      .select(col("probe_id"), col("neighbor_id"))
    val lsh = annLshTopk(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("lhit"))
    val ivf = annIvfTopk(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("ihit"))
    exact
      .join(lsh, Seq("probe_id", "neighbor_id"), "left")
      .join(ivf, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).cast("long").as("n_exact"),
        sum(coalesce(col("lhit"), lit(0L))).cast("long").as("lsh_hits"),
        sum(coalesce(col("ihit"), lit(0L))).cast("long").as("ivf_hits"))
      .withColumn("lsh_recall_bp", expr("10000 * lsh_hits div n_exact"))
      .withColumn("ivf_recall_bp", expr("10000 * ivf_hits div n_exact"))
      .orderBy(col("probe_id"))
  }

  val annRecallAuditSql: String =
    s"""WITH exact AS (
       |  SELECT probe_id, neighbor_id FROM ($cosineTopkSql) x WHERE rnk <= 3
       |), lsh AS (
       |  SELECT probe_id, neighbor_id FROM ($annLshTopkSql) l
       |), ivf AS (
       |  SELECT probe_id, neighbor_id FROM ($annIvfTopkSql) v
       |), joined AS (
       |  SELECT e.probe_id,
       |    CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS lhit,
       |    CASE WHEN v.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS ihit
       |  FROM exact e
       |  LEFT JOIN lsh l ON l.probe_id = e.probe_id AND l.neighbor_id = e.neighbor_id
       |  LEFT JOIN ivf v ON v.probe_id = e.probe_id AND v.neighbor_id = e.neighbor_id
       |), agg AS (
       |  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       |    CAST(SUM(lhit) AS BIGINT) AS lsh_hits, CAST(SUM(ihit) AS BIGINT) AS ivf_hits
       |  FROM joined GROUP BY 1
       |)
       |SELECT probe_id, n_exact, lsh_hits, ivf_hits,
       |  10000 * lsh_hits // n_exact AS lsh_recall_bp,
       |  10000 * ivf_hits // n_exact AS ivf_recall_bp
       |FROM agg ORDER BY probe_id""".stripMargin

  // ----------------------------------- q194 quantization recall audit

  /** q194: recall audit for the QUANTIZATION tiers — the q139 evaluation
    * harness (which measures the LSH/IVF *index structures*) applied to
    * the two compressed-*representation* paths: does int8 scalar
    * quantization (q70, 8× smaller scan) or 4-byte product quantization
    * (q183, 64× smaller scan) change WHICH neighbors come back, relative
    * to the exact long-quantized baseline (q44)? Per probe: how many of
    * the exact cosine top-3 survive in the int8 top-3, and how many in
    * the PQ-ADC top-5 (recall@3-in-5, the standard re-ranking budget).
    * Recall in integer basis points (`10000·hits div 3`), so the audit
    * hash-gates with no floats.
    *
    * Together q139+q194 calibrate the full ANN family: q44 ground truth,
    * q46/q49 index-structure error, q70/q183 representation error. A
    * deployment picks the cheapest tier whose measured recall clears its
    * bar — this query is the number that decision reads.
    *
    * Scale shape: identical to q139 — the cost is the three underlying
    * searches (each a broadcast-probe streamed scan); the audit's own
    * joins see only k·|probes| rows. */
  def quantRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopk(spark, dir).filter(col("rnk") <= 3)
      .select(col("probe_id"), col("neighbor_id"))
    val i8 = int8AnnTopk(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("i8hit"))
    val pq = pqAnn(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("pqhit"))
    exact
      .join(i8, Seq("probe_id", "neighbor_id"), "left")
      .join(pq, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).cast("long").as("n_exact"),
        sum(coalesce(col("i8hit"), lit(0L))).cast("long").as("int8_hits"),
        sum(coalesce(col("pqhit"), lit(0L))).cast("long").as("pq_hits"))
      .withColumn("int8_recall_bp", expr("10000 * int8_hits div n_exact"))
      .withColumn("pq_recall_bp", expr("10000 * pq_hits div n_exact"))
      .orderBy(col("probe_id"))
  }

  val quantRecallAuditSql: String =
    s"""WITH exact AS (
       |  SELECT probe_id, neighbor_id FROM ($cosineTopkSql) x WHERE rnk <= 3
       |), i8 AS (
       |  SELECT probe_id, neighbor_id FROM ($int8AnnTopkSql) l
       |), pq AS (
       |  SELECT probe_id, neighbor_id FROM ($pqAnnSql) v
       |), joined AS (
       |  SELECT e.probe_id,
       |    CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS ihit,
       |    CASE WHEN v.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS phit
       |  FROM exact e
       |  LEFT JOIN i8 l ON l.probe_id = e.probe_id AND l.neighbor_id = e.neighbor_id
       |  LEFT JOIN pq v ON v.probe_id = e.probe_id AND v.neighbor_id = e.neighbor_id
       |), agg AS (
       |  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       |    CAST(SUM(ihit) AS BIGINT) AS int8_hits, CAST(SUM(phit) AS BIGINT) AS pq_hits
       |  FROM joined GROUP BY 1
       |)
       |SELECT probe_id, n_exact, int8_hits, pq_hits,
       |  10000 * int8_hits // n_exact AS int8_recall_bp,
       |  10000 * pq_hits // n_exact AS pq_recall_bp
       |FROM agg ORDER BY probe_id""".stripMargin

  // ----------------------------------- q192 centroid domain selection

  /** q192: embedding-centroid domain selection — the DCLM/"quality via
    * proximity to a trusted seed set" selection step (Li et al. 2024;
    * the embedding-space sibling of q188's DSIR n-gram importance
    * weights): vectors labeled 0 are the trusted target-domain
    * exemplars; every other vector is scored by cosine to the seed
    * CENTROID and the top-64 are selected for training.
    *
    * Exactness: the centroid is the integer mean `floor(Σq_j / n)` of
    * the long-quantized vectors (floor via one double division — seed
    * sums stay < 2^53 up to ~8·10^12 seed vectors, far past 100 TB, and
    * the per-dim mean is ≤ 2^20 so every dot product stays ≤ 2^46 —
    * int64-safe at any corpus size, the same overflow discipline as
    * q183's codebooks). The cosine itself is the q44 contract: exact
    * integer dots, then the identical three IEEE double ops in both
    * engines. The OUTPUT is all-integer (vec_id, label, rank) — ties
    * broken by vec_id — so the hash gate certifies the selected set.
    *
    * Scale shape: one seed-filtered (pos → sum) aggregate collapses to a
    * single 64-long centroid row that BROADCASTS into the map-only
    * scoring pass; selection is orderBy.limit → TakeOrderedAndProject
    * (per-partition top-64 + driver merge, never a global sort); the
    * final rank window runs over the already-limited 64-row frame. */
  val CentroidSelectK = 64

  def centroidSelection(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("q"))
    val cent = q.filter(col("label") === 0)
      .select(posexplode(col("q")))
      .groupBy(col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .select(col("pos"),
        floor(col("s").cast("double") / col("n")).cast("long").as("c"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
        .as("c"))
    val scored = q.filter(col("label") =!= 0)
      .crossJoin(broadcast(cent))
      .withColumn("cos", dotQ(col("q"), col("c")) /
        (sqrt(dotQ(col("q"), col("q"))) * sqrt(dotQ(col("c"), col("c")))))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(CentroidSelectK)
    scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))).cast("int"))
      .select(col("vec_id"), col("label"), col("rnk"))
      .orderBy(col("rnk"))
  }

  val centroidSelectionSql: String =
    s"""WITH q AS (
       |  SELECT vec_id, label,
       |    [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings
       |), dims AS (
       |  SELECT unnest(q) AS v, unnest(range(1, 65)) AS pos FROM q WHERE label = 0
       |), cent AS (
       |  SELECT list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS c
       |  FROM (SELECT pos, SUM(v) AS s, COUNT(*) AS n FROM dims GROUP BY pos)
       |), scored AS (
       |  SELECT vec_id, label,
       |    CAST(list_sum([q[i] * c[i] for i in range(1, 65)]) AS DOUBLE)
       |      / (sqrt(CAST(list_sum([x * x for x in q]) AS DOUBLE))
       |         * sqrt(CAST(list_sum([x * x for x in c]) AS DOUBLE))) AS cos
       |  FROM q, cent WHERE label <> 0
       |), ranked AS (
       |  SELECT vec_id, label,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rnk
       |  FROM scored
       |)
       |SELECT vec_id, label, CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= $CentroidSelectK ORDER BY rnk""".stripMargin

  // ----------------------------------- q199 inter-source duplication flow

  /** q199: INTER-SOURCE DUPLICATION MATRIX — the provenance number a
    * dataset card publishes next to q177's concentration: near-duplicate
    * mass broken down by WHICH source pairs share it. Within-source
    * duplication means re-crawls/boilerplate; heavy cross-source cells
    * mean mirrored content (the same article syndicated everywhere) —
    * two different curation actions, indistinguishable in q41's flat
    * pair list.
    *
    * One row per unordered source pair that shares ≥ 1 verified near-dup
    * pair (the q41 cut): pair count, distinct docs involved on each
    * SOURCE side — `n_docs_lo` counts the doc that lies on the `src_lo`
    * side of each pair, `n_docs_hi` the `src_hi`-side doc, so for a
    * cross-source cell each count is per source (a src_hi doc is never
    * counted in n_docs_lo); for a within-source cell (src_lo = src_hi)
    * the split degenerates to id-order position (id_a = smaller id) —
    * and an xor fingerprint of the pair keys so the hash gate certifies
    * the exact pair SET, not just its size.
    *
    * Scale shape: the verified pairs are the q41 pipeline (session-landed
    * shingle groups); the only additions are two shuffle joins against
    * the slim (doc_id, source) projection (corpus-growing, so never a
    * broadcast build side) and a ≤|sources|² census aggregate. */
  def dupFlowMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val pairs = lshVerifiedPairs(spark, dir)
      .select(col("id_a"), col("id_b"))
      .join(src.select(col("doc_id").as("id_a"), col("source").as("s_a")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("s_b")), Seq("id_b"))
      .select(least(col("s_a"), col("s_b")).as("src_lo"),
        greatest(col("s_a"), col("s_b")).as("src_hi"),
        col("s_a"), col("s_b"), col("id_a"), col("id_b"))
    pairs
      .groupBy(col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        // per-SOURCE-side doc counts: the doc on the src_lo side of each
        // pair (id_a iff s_a = src_lo — within-source cells fall back to
        // id order since both branches agree), and its src_hi twin
        countDistinct(when(col("s_a") === col("src_lo"), col("id_a"))
          .otherwise(col("id_b"))).cast("long").as("n_docs_lo"),
        countDistinct(when(col("s_b") === col("src_hi"), col("id_b"))
          .otherwise(col("id_a"))).cast("long").as("n_docs_hi"),
        // md5-60 of the pair key (the q190 idiom) — xor-folding a product
        // of raw ids would overflow int64 at large id ranges
        expr("bit_xor(CAST(conv(substring(md5(concat(CAST(id_a AS STRING), ',', " +
          "CAST(id_b AS STRING))), 1, 15), 16, 10) AS BIGINT))")
          .cast("long").as("pair_fp"))
      .orderBy(col("src_lo"), col("src_hi"))
  }

  val dupFlowMatrixSql: String =
    s"""WITH pairs AS ($minhashLshPairsSql),
       |flows AS (
       |  SELECT least(da.source, db.source) AS src_lo,
       |    greatest(da.source, db.source) AS src_hi,
       |    da.source AS s_a, db.source AS s_b,
       |    p.id_a, p.id_b
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.id_a
       |  JOIN documents db ON db.doc_id = p.id_b
       |)
       |SELECT src_lo, src_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(COUNT(DISTINCT CASE WHEN s_a = src_lo THEN id_a ELSE id_b END) AS BIGINT) AS n_docs_lo,
       |  CAST(COUNT(DISTINCT CASE WHEN s_b = src_hi THEN id_b ELSE id_a END) AS BIGINT) AS n_docs_hi,
       |  CAST(bit_xor(CAST(concat('0x', substr(md5(
       |    CAST(id_a AS VARCHAR) || ',' || CAST(id_b AS VARCHAR)), 1, 15)) AS BIGINT)) AS BIGINT) AS pair_fp
       |FROM flows GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------- q197 contrastive pair mining

  /** q197: CONTRASTIVE TRAINING-PAIR MINING — the dataset-construction
    * step for embedding-model training (SimCSE/E5-style): for every
    * document with a verified near-duplicate, emit ONE positive (its
    * most-similar verified partner) and the [[ContrastiveNegK]] HARDEST
    * negatives — documents that collided with it in an LSH band (so the
    * index considers them confusable) yet verified BELOW the near-dup
    * threshold. Random negatives are easy; band-collision negatives are
    * precisely the confusables a contrastive objective needs.
    *
    * Similarity is exact integer basis points `(10⁴·|A∩B|) div |A∪B|`
    * over the hashed-shingle sets — `bp ≥ 9000 ⟺ jaccard ≥ 0.9`
    * exactly (cross-multiplication), so the pos/neg split is the same
    * cut q41 verifies and the whole output hash-gates with no floats.
    *
    * Scale shape: ONE scoring pass in REP space over the deduped band
    * candidates (no size-ratio prefilter — mining needs the
    * sub-threshold pairs q41's prefilter exists to discard), landed
    * SLIM (gid, gid, bp — never the expanded doc pairs) so the pos and
    * neg branches read one materialization; doc-space expansion and
    * both rank windows are partitioned by anchor. An anchor-restricted
    * two-pass variant (positives via q41's prefiltered pipeline,
    * negatives via an asymmetric anchor-band probe) was measured SLOWER
    * at sf0.1 (7.2 s vs 6.7 s vs this form's 2.9 s, min-of-3,
    * 2026-08-15): near-dup anchors
    * cover most groups here, so the second band join paid more than
    * the skipped verifications saved. */
  val ContrastiveNegK = 2

  def contrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    val grps = landedShingleGroups(spark, dir)
    val sets = grps.filter(size(col("hs")) > 0)
    val slim = sets.select(col("gid"), col("members"))
    // the ONE session-shared exact scoring pass ([[landedScoredPairs]],
    // r12): this query's full-bp-range consumer and the verified-only
    // family (q41/q50/q55/q85/q199) now read the same landed frame
    // instead of re-running band self-join + kernel each
    val scored = landedScoredPairs(spark, dir)
      .withColumn("bp", expr(
        "(10000 * n_shared) div CAST(sz_a + sz_b - n_shared AS BIGINT)"))
      .select(col("gid_a"), col("gid_b"), col("bp"))
    // ---- doc-space expansion (both directions through ONE generator)
    def expand(repPairs: DataFrame): DataFrame = repPairs
      .join(slim.select(col("gid").as("gid_a"), col("members").as("ma")), Seq("gid_a"))
      .join(slim.select(col("gid").as("gid_b"), col("members").as("mb")), Seq("gid_b"))
      .select(explode(expr(
        "array(struct(ma AS anch, mb AS part), struct(mb AS anch, ma AS part))")).as("d"),
        col("bp"))
      .select(explode(col("d.anch")).as("anchor"), col("d.part").as("part"), col("bp"))
      .select(col("anchor"), explode(col("part")).as("partner"), col("bp"))
    val within = sets.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("anchor"), col("members"))
      .select(col("anchor"),
        explode(filter(col("members"), m => m =!= col("anchor"))).as("partner"),
        lit(10000L).as("bp"))
    val byAnchor = Window.partitionBy(col("anchor"))
      .orderBy(col("bp").desc, col("partner"))
    val pos = expand(scored.filter(col("bp") >= 9000)).union(within)
      .withColumn("rnk", row_number().over(byAnchor)).filter(col("rnk") === 1)
      .select(col("anchor"), lit("pos").as("role"), col("partner"),
        col("rnk").cast("int").as("rnk"), col("bp"))
      .transform(Dist.durableCkpt) // feeds the output AND the neg semi-join
    val neg = expand(scored.filter(col("bp") < 9000))
      .join(pos.select(col("anchor")), Seq("anchor"), "left_semi")
      .withColumn("rnk", row_number().over(byAnchor))
      .filter(col("rnk") <= ContrastiveNegK)
      .select(col("anchor"), lit("neg").as("role"), col("partner"),
        col("rnk").cast("int").as("rnk"), col("bp"))
    // ckpt before the presentation orderBy: range partitioning SAMPLES
    // its child to pick boundaries, and without the barrier that
    // re-executes the whole un-checkpointed neg branch (expand + window)
    // a second time (sf1 isolated min-of-3: 15.4 -> 14.1 s, reps noisy)
    pos.union(neg).transform(Dist.durableCkpt)
      .orderBy(col("anchor"), col("role"), col("rnk"))
  }

  val contrastivePairsSql: String =
    s"""WITH $sigCteSql,
       |bands AS (
       |  SELECT doc_id, i // $RowsPerBand AS band, list(sig ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |), scored AS MATERIALIZED (
       |  SELECT id_a, id_b,
       |    (10000 * len(list_intersect(sa.hs, sb.hs)))
       |      // (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS bp
       |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |), sym AS MATERIALIZED (
       |  SELECT id_a AS anchor, id_b AS partner, bp FROM scored
       |  UNION ALL SELECT id_b, id_a, bp FROM scored
       |), pos AS MATERIALIZED (
       |  SELECT anchor, partner, bp,
       |    ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY bp DESC, partner) AS rnk
       |  FROM sym WHERE bp >= 9000
       |), neg AS (
       |  SELECT anchor, partner, bp,
       |    ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY bp DESC, partner) AS rnk
       |  FROM sym WHERE bp < 9000 AND anchor IN (SELECT anchor FROM pos WHERE rnk = 1)
       |)
       |SELECT anchor, 'pos' AS role, partner, CAST(rnk AS INT) AS rnk,
       |  CAST(bp AS BIGINT) AS bp
       |FROM pos WHERE rnk = 1
       |UNION ALL
       |SELECT anchor, 'neg', partner, CAST(rnk AS INT), CAST(bp AS BIGINT)
       |FROM neg WHERE rnk <= $ContrastiveNegK
       |ORDER BY anchor, role, rnk""".stripMargin

  // ------------------------------------------ q178 containment ingest

  /** q178: INCREMENTAL containment probe — the q68/q152 land-once
    * pattern applied to the containment tier (q143): a later-arriving
    * batch (the q68 fixture convention, doc_id ≡ 7 mod 10) is probed
    * against the LANDED corpus for redundancy: is ≥ 90 % of the new
    * doc's trigram set already inside some existing doc? The ingest
    * gate a crawl pipeline runs before admitting near-redundant
    * newcomers (truncated re-crawls, quote-wrapper pages) that exact
    * and Jaccard dedup both miss.
    *
    * EXACTNESS of the prefix probe: if ≥ 0.9·|A| of A's shingles are in
    * B, then ANY (⌊0.1·|A|⌋+1)-subset of A's shingles hits B
    * (pigeonhole) — so probing each batch set's K rarest shingles
    * against the postings loses nothing REGARDLESS of the rarity
    * ranking; rarity (by landed document frequency, batch-absent
    * shingles ranked rarest at df 0) only minimizes candidates. The
    * DuckDB oracle verifies by brute force over all batch×corpus pairs.
    *
    * Scale shape: at 100 TB the postings (h → cor_id) and the df table
    * are LANDED tables (the q87 deployment); here they derive in-query
    * from one checkpointed per-doc set pass so the whole contract stays
    * oracle-checkable. Batch-side frames broadcast (probe prefixes are
    * ≈ 0.1·|batch sets|); the only corpus-touching joins are the
    * posting equi-join and the candidate attach — work ∝ batch. Best
    * match per doc via one min(struct) aggregate, ties to the lowest
    * corpus id. */
  def containmentIngest(spark: SparkSession, dir: String): DataFrame = {
    val isIncoming = pmod(col("doc_id"), lit(10)) === 7
    val sets = graft.Dist.fanOut(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("hs", gram3Hashed(col("t")))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("sz"))
      .transform(Dist.durableCkpt)
    val incoming = sets.filter(isIncoming && size(col("hs")) > 0)
    val corpus = sets.filter(!isIncoming)
    val postings = corpus.select(col("doc_id").as("cor_id"),
      col("sz").as("sz_c"), explode(col("hs")).as("h"))
    val dfreq = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefixes = incoming
      .select(col("doc_id").as("inc_id"), col("sz").as("sz_i"),
        explode(col("hs")).as("h"))
      .join(dfreq, Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("inc_id")).orderBy(col("df"), col("h"))))
      .filter(col("rn") <= col("sz_i") - expr("(9 * sz_i + 9) div 10") + 1)
      .select(col("inc_id"), col("h"))
    val cand = prefixes.join(postings, Seq("h"))
      .select(col("inc_id"), col("cor_id")).distinct()
    val verified = cand
      .join(broadcast(incoming.select(col("doc_id").as("inc_id"),
        col("hs").as("hs_i"), col("sz").as("sz_i"))), Seq("inc_id"))
      .join(corpus.select(col("doc_id").as("cor_id"),
        col("hs").as("hs_c"), col("sz").as("sz_c")), Seq("cor_id"))
      .filter(lit(10) * col("sz_c") >= lit(9) * col("sz_i"))
      .withColumn("n_shared", graft.functions.ArrayKernels
        .sortedIntersectCount(col("hs_i"), col("hs_c")).cast("long"))
      .filter(lit(10) * col("n_shared") >= lit(9) * col("sz_i"))
      .withColumn("cont_bp", expr("10000 * n_shared div sz_i"))
      .groupBy(col("inc_id"))
      .agg(min(struct((lit(10000L) - col("cont_bp")).as("neg"),
        col("cor_id"), col("cont_bp"))).as("b"))
      .select(col("inc_id").as("doc_id"),
        col("b.cor_id").as("best_match"), col("b.cont_bp").as("containment_bp"))
    incoming.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("best_match").isNotNull, "contained").otherwise("novel")
          .as("status"),
        col("best_match"), col("containment_bp"))
      .orderBy(col("doc_id"))
  }

  val containmentIngestSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents
       |), sh AS MATERIALIZED (
       |  SELECT doc_id, list_sort(list_distinct(
       |    [CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15)) AS BIGINT) % $P
       |     for i in range(1, len(t) - 1)])) AS hs
       |  FROM toks WHERE len(t) >= 3
       |), s AS MATERIALIZED (
       |  SELECT doc_id, hs, CAST(len(hs) AS BIGINT) AS sz FROM sh
       |), inc AS (SELECT * FROM s WHERE doc_id % 10 = 7 AND sz > 0),
       |cor AS (SELECT * FROM s WHERE doc_id % 10 <> 7),
       |v AS (
       |  SELECT i.doc_id, c.doc_id AS cor_id,
       |    10000 * CAST(len(list_intersect(i.hs, c.hs)) AS BIGINT) // i.sz AS cont_bp
       |  FROM inc i JOIN cor c ON 10 * c.sz >= 9 * i.sz
       |  WHERE 10 * len(list_intersect(i.hs, c.hs)) >= 9 * i.sz
       |), best AS (
       |  SELECT doc_id, cor_id AS best_match, cont_bp AS containment_bp,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY cont_bp DESC, cor_id) AS r
       |  FROM v
       |)
       |SELECT i.doc_id,
       |  CASE WHEN b.best_match IS NOT NULL THEN 'contained' ELSE 'novel' END AS status,
       |  b.best_match, b.containment_bp
       |FROM inc i LEFT JOIN (SELECT * FROM best WHERE r = 1) b USING (doc_id)
       |ORDER BY i.doc_id""".stripMargin

  // ---------------------- q229 in-context pretraining ordering

  private val IcpP = 1000000007L

  /** Documents per context window — the q229 packing unit. */
  private val IcpWindow = 32

  /** q229: in-context pretraining ordering — place RELATED documents in
    * the same context window instead of shuffling them apart [Shi et
    * al., "In-Context Pretraining: Language Modeling Beyond Document
    * Boundaries", arXiv:2310.10638 — their traveling-salesman document
    * path, approximated here by the scalable cluster-then-order form:
    * sort by (cluster, distance-to-centroid, id) so each window draws
    * from one semantic neighborhood]. The deliberate opposite of q119's
    * deterministic SHUFFLE ordering: that shard plan maximizes mixing,
    * this one maximizes within-window coherence; a training stack uses
    * q119 for stage-one pretraining and this for the long-context
    * extension phase.
    *
    * The gate binds the ORDER itself, not just counts: ord_fp is
    * position-weighted, so swapping any two docs inside a window (or
    * across windows) moves it. n_clusters per window certifies
    * coherence structurally — windows are single-cluster except at the
    * ≤ k−1 cluster boundaries. All arithmetic is the integer-exact
    * kmeans/int8 family (q75's memoized Lloyd assignment, the same
    * squared-distance formula), so the full trajectory hash-gates
    * against the unrolled DuckDB oracle.
    *
    * Scale shape: memoized cluster assignment (landed once per
    * session), broadcast k-row centroid frame, codegen'd integer dot
    * kernels, and ONE range exchange for the global order via
    * `Dist.globalRowNumber` — never a single-partition window. At
    * 100 TB the range partitioner keys on (cid, dist), which is
    * near-uniform by construction (clusters are balanced by Lloyd,
    * distances spread within each). */
  def icpOrder(spark: SparkSession, dir: String): DataFrame = {
    val (a2, c2) = kmeansAssignment(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
    val scored = e.join(a2, Seq("vec_id"))
      .join(broadcast(c2), Seq("cid"))
      .withColumn("dist",
        dotQ(col("q"), col("q")) - lit(2L) * dotQ(col("q"), col("qc")) +
          dotQ(col("qc"), col("qc")))
      .select(col("vec_id"), col("cid"), col("dist"))
    graft.Dist.globalRowNumber(scored,
        struct(col("cid"), col("dist"), col("vec_id")))
      .withColumn("window_id", expr(s"(rn - 1) div $IcpWindow"))
      .withColumn("pos", expr(s"(rn - 1) % $IcpWindow"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cid")).as("n_clusters"),
        pmod(sum(pmod(col("dist"), lit(IcpP))), lit(IcpP)).as("dist_fp"),
        pmod(sum((col("pos") + 1) * pmod(col("vec_id"), lit(IcpP))),
          lit(IcpP)).as("ord_fp"))
      .orderBy(col("window_id"))
  }

  /** Oracle: the shared Lloyd chain (q75's CTEs), the same integer
    * squared distance to the final centroids, one global ROW_NUMBER. */
  val icpOrderSql: String =
    s"""WITH $kmeansCteSql, d AS (
       |  SELECT v.vec_id, a.cid,
       |    CAST(list_sum([v.q[i] * v.q[i] for i in range(1, 65)]) AS BIGINT)
       |      - 2 * CAST(list_sum([v.q[i] * c.qc[i] for i in range(1, 65)]) AS BIGINT)
       |      + CAST(list_sum([c.qc[i] * c.qc[i] for i in range(1, 65)]) AS BIGINT) AS dist
       |  FROM q v JOIN a2 a USING (vec_id) JOIN c2 c ON a.cid = c.cid
       |), o AS (
       |  SELECT vec_id, cid, dist,
       |    ROW_NUMBER() OVER (ORDER BY cid, dist, vec_id) AS rn
       |  FROM d
       |)
       |SELECT (rn - 1) // $IcpWindow AS window_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_clusters,
       |  CAST(SUM(dist % $IcpP) % $IcpP AS BIGINT) AS dist_fp,
       |  CAST(SUM(((rn - 1) % $IcpWindow + 1) * (vec_id % $IcpP))
       |    % $IcpP AS BIGINT) AS ord_fp
       |FROM o GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q229_icp_order", icpOrder, Some(icpOrderSql)),
    QueryDef("q40_minhash_signatures", minhashSignatures, Some(minhashSignaturesSql)),
    QueryDef("q41_minhash_lsh_pairs", minhashLshPairs, Some(minhashLshPairsSql)),
    QueryDef("q42_ngram_jaccard_topk", ngramJaccardTopk, Some(ngramJaccardTopkSql)),
    QueryDef("q43_simhash", simhash, Some(simhashSql)),
    QueryDef("q44_cosine_topk", cosineTopk, Some(cosineTopkSql)),
    QueryDef("q45_lsh_buckets", lshBuckets, Some(lshBucketsSql)),
    QueryDef("q46_ann_lsh_topk", annLshTopk, Some(annLshTopkSql)),
    QueryDef("q47_label_centroids", labelCentroids, Some(labelCentroidsSql)),
    QueryDef("q48_cosine_neardup", cosineNearDup, Some(cosineNearDupSql)),
    QueryDef("q49_ann_ivf_topk", annIvfTopk, Some(annIvfTopkSql)),
    QueryDef("q183_pq_ann", pqAnn, Some(pqAnnSql)),
    QueryDef("q50_pipeline_stats", pipelineStats, Some(pipelineStatsSql)),
    QueryDef("q53_simhash_neardup", simhashNearDup, Some(simhashNearDupSql)),
    QueryDef("q55_neardup_clusters", nearDupClusters, Some(nearDupClustersSql)),
    QueryDef("q67_cluster_reps", clusterRepresentatives, Some(clusterRepresentativesSql)),
    QueryDef("q68_incremental_dedup", incrementalDedup, Some(incrementalDedupSql)),
    // same answer as q68 by construction — the layout changes the plan,
    // not the result, so the oracle is shared
    QueryDef("q87_bucketed_incremental_dedup", bucketedIncrementalDedup, Some(incrementalDedupSql)),
    // same answer as q41 by construction — the bucketed-catalog layout
    // changes the plan (zero corpus-side exchange, zero groups
    // broadcast), not the result, so the oracle is shared
    QueryDef("q203_bucketed_neardup_pairs", bucketedNearDupPairs, Some(minhashLshPairsSql)),
    QueryDef("q93_leakage_safe_split", leakageSafeSplit, Some(leakageSafeSplitSql)),
    QueryDef("q70_int8_ann_topk", int8AnnTopk, Some(int8AnnTopkSql)),
    QueryDef("q75_kmeans", kmeans, Some(kmeansSql)),
    QueryDef("q118_semantic_dedup", semanticDedup, Some(semanticDedupSql)),
    QueryDef("q85_curated_corpus", curatedCorpus, Some(curatedCorpusSql)),
    QueryDef("q98_gram_matrix", gramMatrix, Some(gramMatrixSql)),
    QueryDef("q99_rrf_fusion", rrfFusion, Some(rrfFusionSql)),
    QueryDef("q116_cluster_top_terms", clusterTopTerms, Some(clusterTopTermsSql)),
    QueryDef("q129_mmr_selection", mmrSelection, Some(mmrSelectionSql)),
    QueryDef("q133_index_maintenance", indexMaintenance, Some(indexMaintenanceSql)),
    QueryDef("q134_embedding_outliers", embeddingOutliers, Some(embeddingOutliersSql)),
    QueryDef("q136_license_propagation", licensePropagation, Some(licensePropagationSql)),
    QueryDef("q139_ann_recall_audit", annRecallAudit, Some(annRecallAuditSql)),
    QueryDef("q194_quant_recall_audit", quantRecallAudit, Some(quantRecallAuditSql)),
    QueryDef("q192_centroid_selection", centroidSelection, Some(centroidSelectionSql)),
    QueryDef("q143_containment_pairs", containmentPairs, Some(containmentPairsSql)),
    QueryDef("q178_containment_ingest", containmentIngest, Some(containmentIngestSql)),
    QueryDef("q145_crossmodal_purity", crossmodalPurity, Some(crossmodalPuritySql)),
    QueryDef("q147_lsh_tuning_curve", lshTuningCurve, Some(lshTuningCurveSql)),
    QueryDef("q197_contrastive_pairs", contrastivePairs, Some(contrastivePairsSql)),
    QueryDef("q199_dup_flow_matrix", dupFlowMatrix, Some(dupFlowMatrixSql)),
    QueryDef("q200_cluster_size_census", clusterSizeCensus,
      Some(clusterSizeCensusSql))
  )
}
