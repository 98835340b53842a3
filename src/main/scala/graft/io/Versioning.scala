package graft.io

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q234: the dataset RELEASE round-trip gate — publish snapshot v1, roll
  * back to v0, roll forward again, and prove BIT-IDENTITY in both
  * directions. The versioning primitives are each oracle-gated alone
  * (q125 manifest fingerprints, q128 CDC apply, q181 diff recovery,
  * q179 rendezvous sharding); what single-stage gates cannot see is the
  * COMPOSITION — that the diff q181 recovers is exactly the delta q128
  * needs to invert, that inverting restores every byte, and that the
  * restored snapshot lands in the identical SHARD layout (same rationale
  * as q218/q233 for the ingest tier: composition bugs are invisible to
  * single-stage gates).
  *
  * The chain, all deterministic from the base corpus (q128's fixture
  * delta — ~3% deletes / ~6% updates / ~2% inserts by keyed-hash
  * bucket, so the oracle derives the identical batch):
  *
  *  1. v0 = the slim snapshot (doc_id, lang, source, n_chars);
  *  2. v1 = apply(v0, Δ) — q128's one-pass merge;
  *  3. Δ' = diff(v0, v1) — q181's full-outer classification, CARRYING
  *     BOTH states (the pre-state of removed/changed rows is what makes
  *     rollback possible at all — a diff that only records post-states
  *     cannot invert);
  *  4. back = apply⁻¹(v1, Δ') = v1 − added − changed_post + changed_pre
  *     + removed_pre;
  *  5. fwd = apply(back, Δ') — the re-publish.
  *
  * Certification: per source, counts and q125-style order-independent
  * `bit_xor` fingerprints of all four snapshots, where each row's hash
  * INCLUDES its q179 rendezvous shard assignment — fp_back == fp_v0 and
  * fp_fwd == fp_v1 then certify content AND layout in both directions
  * (the oracle computes the same chain, so a lossy diff, a wrong
  * inverse, or a shard drift breaks the gate).
  *
  * 100 TB shape: ONE full-outer join on doc_id (bucketed co-location at
  * scale, q181's note); the rollback/forward edits are anti-joins
  * against the CHANGE-CLASS id sets — CDC-batch-bounded frames (q128's
  * contract) joined WITHOUT hints so stats pick broadcast at batch
  * scale and SMJ past it; the shard assignment is q179's row-local
  * kernel (no assignment table, no join); the census is one map-side
  * combined aggregate per snapshot. The classified diff and the two
  * derived snapshots are checkpointed once each — every frame feeds two
  * consumers and Spark does no plan CSE across branches. */
object Versioning {

  import graft.llm.Similarity.hash60

  private val Sep = "\u001f" // q125's unit-separator field delimiter
  private val S = Layout.RdvOldShards + 1 // 9 shards: the post-q179 layout

  /** q179's rendezvous kernel: the shard maximizing the per-(doc, shard)
    * 60-bit weight — row-local, no directory. */
  private def shardOf(doc: Column): Column = {
    def w60(s: Column): Column =
      conv(substring(md5(concat(lit("rdv:"), doc.cast("string"), lit(":"),
        s.cast("string"))), 1, 15), 16, 10).cast("long")
    array_max(transform(sequence(lit(0), lit(S - 1)),
      s => struct(w60(s).as("w"), s.as("s")))).getField("s")
  }

  private def census(df: DataFrame, n: String, fp: String): DataFrame =
    df.select(col("source"),
      hash60(concat_ws(Sep, col("doc_id"), col("lang"), col("n_chars"),
        shardOf(col("doc_id")))).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as(n), expr("bit_xor(h)").cast("long").as(fp))

  def snapshotRollback(spark: SparkSession, dir: String): DataFrame = {
    import graft.Dist.durableCkpt
    def bucket(prefix: String) =
      pmod(hash60(concat(lit(prefix), col("doc_id").cast("string"))), lit(100L))
    val v0 = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    // ---- publish v1 (q128's delta arithmetic)
    val dels = v0.filter(bucket("cdc-d:") < 3).select(col("doc_id"))
    val upds = v0.filter(bucket("cdc-d:") >= 3 && bucket("cdc-u:") < 6)
      .select(col("doc_id"), lit("xx").as("lang"), col("source"),
        (col("n_chars") + 100L).as("n_chars"))
    // insert-id offset 1<<40: OUTSIDE any reachable id domain (ids are
    // bounded by Scaling.Stride × copies ≪ 2^40; the r11 ADVICE found the
    // old +1e6 offset equals Stride exactly, so on a factor≥2 Scaling
    // corpus every planted insert would collide with copy-1 ids and the
    // diff/rollback inversion would silently stop being exact)
    val ins = v0.filter(bucket("cdc-i:") < 2)
      .select((col("doc_id") + (1L << 40)).as("doc_id"), col("lang"),
        col("source"), (col("n_chars") + 1L).as("n_chars"))
    val touched = dels.union(upds.select(col("doc_id")))
    val v1 = v0.join(touched, Seq("doc_id"), "left_anti")
      .unionByName(upds).unionByName(ins)
      .transform(durableCkpt)
    // ---- recover Δ' from the snapshots alone (q181, both states kept)
    val a = v0.select(col("doc_id"), col("lang").as("a_lang"),
      col("source").as("a_source"), col("n_chars").as("a_n"))
    val b = v1.select(col("doc_id"), col("lang").as("b_lang"),
      col("source").as("b_source"), col("n_chars").as("b_n"))
    val diff = a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("cls",
        when(col("a_lang").isNull && col("a_n").isNull, "added")
          .when(col("b_lang").isNull && col("b_n").isNull, "removed")
          .when(col("a_lang") =!= col("b_lang") || col("a_n") =!= col("b_n"),
            "changed")
          .otherwise("unchanged"))
      .filter(col("cls") =!= "unchanged")
      .transform(durableCkpt)
    def pre(d: DataFrame) = d.select(col("doc_id"), col("a_lang").as("lang"),
      col("a_source").as("source"), col("a_n").as("n_chars"))
    def post(d: DataFrame) = d.select(col("doc_id"), col("b_lang").as("lang"),
      col("b_source").as("source"), col("b_n").as("n_chars"))
    // ---- roll back: v1 minus (added ∪ changed-post), plus pre-states
    val back = v1
      .join(diff.filter(col("cls").isin("added", "changed"))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(pre(diff.filter(col("cls") === "changed")))
      .unionByName(pre(diff.filter(col("cls") === "removed")))
      .transform(durableCkpt)
    // ---- roll forward: back minus (removed ∪ changed-pre), plus posts
    val fwd = back
      .join(diff.filter(col("cls").isin("removed", "changed"))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(post(diff.filter(col("cls") === "changed")))
      .unionByName(post(diff.filter(col("cls") === "added")))
    // coalesce to 0 so a source that empties out of one snapshot still
    // yields engine-identical (and pandas-dtype-stable) integers
    census(v0, "n_v0", "fp_v0")
      .join(census(v1, "n_v1", "fp_v1"), Seq("source"), "full_outer")
      .join(census(back, "n_back", "fp_back"), Seq("source"), "full_outer")
      .join(census(fwd, "n_fwd", "fp_fwd"), Seq("source"), "full_outer")
      .select(col("source") +: Seq("n_v0", "fp_v0", "n_v1", "fp_v1",
        "n_back", "fp_back", "n_fwd", "fp_fwd")
        .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy(col("source"))
  }

  /** Oracle: the identical chain in SQL — v1 from the delta arithmetic,
    * the diff from a FULL JOIN, rollback/forward from the recovered
    * classes, every census hashing (doc_id, lang, n_chars, rendezvous
    * shard). A correct implementation yields fp_back = fp_v0 and
    * fp_fwd = fp_v1 on both engines; a defect anywhere in the chain
    * moves one engine's fingerprint off the other's. */
  val snapshotRollbackSql: String = {
    def h60(key: String) =
      s"CAST(concat('0x', substr(md5($key), 1, 15)) AS BIGINT)"
    def bucket(prefix: String) =
      s"${h60(s"'$prefix' || CAST(doc_id AS VARCHAR)")} % 100"
    val shard = "struct_extract(list_max(list_transform(generate_series(0, " +
      s"${S - 1}), s -> struct_pack(w := " +
      h60("'rdv:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)") +
      ", s := s))), 's')"
    def cen(src: String, n: String, fp: String) =
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS $n,
         |  CAST(bit_xor(${h60(s"concat_ws(chr(31), doc_id, lang, n_chars, $shard)")}) AS BIGINT) AS $fp
         |FROM $src GROUP BY source""".stripMargin
    s"""WITH v0 AS (SELECT doc_id, lang, source, n_chars FROM documents),
       |del AS (SELECT doc_id FROM v0 WHERE ${bucket("cdc-d:")} < 3),
       |upd AS (SELECT doc_id, 'xx' AS lang, source, n_chars + 100 AS n_chars
       |        FROM v0 WHERE ${bucket("cdc-d:")} >= 3 AND ${bucket("cdc-u:")} < 6),
       |ins AS (SELECT doc_id + 1099511627776 AS doc_id, lang, source, n_chars + 1 AS n_chars
       |        FROM v0 WHERE ${bucket("cdc-i:")} < 2),
       |v1 AS MATERIALIZED (
       |  SELECT b.doc_id, b.lang, b.source, b.n_chars FROM v0 b
       |  WHERE NOT EXISTS (SELECT 1 FROM del x WHERE x.doc_id = b.doc_id)
       |    AND NOT EXISTS (SELECT 1 FROM upd x WHERE x.doc_id = b.doc_id)
       |  UNION ALL SELECT doc_id, lang, source, n_chars FROM upd
       |  UNION ALL SELECT doc_id, lang, source, n_chars FROM ins
       |), diff AS MATERIALIZED (
       |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       |    CASE WHEN a.doc_id IS NULL THEN 'added'
       |         WHEN b.doc_id IS NULL THEN 'removed'
       |         WHEN a.lang <> b.lang OR a.n_chars <> b.n_chars THEN 'changed'
       |         ELSE 'unchanged' END AS cls,
       |    a.lang AS a_lang, a.source AS a_source, a.n_chars AS a_n,
       |    b.lang AS b_lang, b.source AS b_source, b.n_chars AS b_n
       |  FROM v0 a FULL JOIN v1 b ON a.doc_id = b.doc_id
       |), back AS MATERIALIZED (
       |  SELECT v.doc_id, v.lang, v.source, v.n_chars FROM v1 v
       |  WHERE NOT EXISTS (SELECT 1 FROM diff d
       |    WHERE d.doc_id = v.doc_id AND d.cls IN ('added', 'changed'))
       |  UNION ALL SELECT doc_id, a_lang, a_source, a_n FROM diff WHERE cls = 'changed'
       |  UNION ALL SELECT doc_id, a_lang, a_source, a_n FROM diff WHERE cls = 'removed'
       |), fwd AS (
       |  SELECT v.doc_id, v.lang, v.source, v.n_chars FROM back v
       |  WHERE NOT EXISTS (SELECT 1 FROM diff d
       |    WHERE d.doc_id = v.doc_id AND d.cls IN ('removed', 'changed'))
       |  UNION ALL SELECT doc_id, b_lang, b_source, b_n FROM diff WHERE cls = 'changed'
       |  UNION ALL SELECT doc_id, b_lang, b_source, b_n FROM diff WHERE cls = 'added'
       |),
       |c0 AS (${cen("v0", "n_v0", "fp_v0")}),
       |c1 AS (${cen("v1", "n_v1", "fp_v1")}),
       |cb AS (${cen("back", "n_back", "fp_back")}),
       |cf AS (${cen("fwd", "n_fwd", "fp_fwd")})
       |SELECT COALESCE(c0.source, c1.source, cb.source, cf.source) AS source,
       |  COALESCE(n_v0, 0) AS n_v0, COALESCE(fp_v0, 0) AS fp_v0,
       |  COALESCE(n_v1, 0) AS n_v1, COALESCE(fp_v1, 0) AS fp_v1,
       |  COALESCE(n_back, 0) AS n_back, COALESCE(fp_back, 0) AS fp_back,
       |  COALESCE(n_fwd, 0) AS n_fwd, COALESCE(fp_fwd, 0) AS fp_fwd
       |FROM c0
       |FULL JOIN c1 ON c1.source = c0.source
       |FULL JOIN cb ON cb.source = COALESCE(c0.source, c1.source)
       |FULL JOIN cf ON cf.source = COALESCE(c0.source, c1.source, cb.source)
       |ORDER BY source""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q234_snapshot_rollback", snapshotRollback,
      Some(snapshotRollbackSql)))
}
