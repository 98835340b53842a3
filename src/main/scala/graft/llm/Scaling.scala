package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpus scaler for the dedup/ANN scaling measurements
  * (SCALING.md, ScalingSpec): a factor-F corpus derived from the harness
  * tables by replication under an ISOMORPHIC per-copy mutation.
  *
  * Why isomorphic: the 100 TB claim for q41/q94/q118/q143 is that work
  * grows with the TRUE duplicate density, not with N² — so the scaled
  * corpus must hold duplicate density constant while N grows. Each copy
  * c prefixes every token with `c<c>x`, a bijection on the token
  * alphabet: every within-copy shingle/span/containment relation of the
  * base corpus is reproduced exactly (same pair counts per copy), while
  * NO shingle collides across copies (a `c1x…` trigram never equals a
  * `c2x…` one). Copy 0 is the base corpus verbatim, so factor 1 is the
  * identity. Embeddings rotate by c positions (norm-preserving,
  * deterministic) and offset vec_id the same way. No RNG anywhere —
  * byte-reproducible across runs and machines. */
object Scaling {

  /** id offset between copies; far above any harness doc_id/vec_id. */
  val Stride = 1000000L

  /** The copy construction is only isomorphic while ids stay below
    * [[Stride]] — a colliding id would merge groups ACROSS copies and
    * silently corrupt every "exactly k×" measurement downstream. Fail
    * loudly instead (one bounded one-row action). */
  private def requireIdsBelowStride(df: DataFrame, idCol: String): Unit = {
    val r = df.agg(max(col(idCol))).head()
    require(r.isNullAt(0) || r.getLong(0) < Stride,
      s"$idCol reaches ${r.get(0)} >= Stride $Stride: copies would collide")
  }

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    requireIdsBelowStride(docs, "doc_id")
    // the isomorphism claim (no cross-copy shingle collisions) requires
    // that NO base token already looks like a copy-c marker: copy 0 keeps
    // such a token verbatim while copy c would manufacture the identical
    // token. Fail loudly (one bounded one-row action) instead of silently
    // deflating candidate counts.
    if (factor > 1) {
      val clashes = docs
        .filter(col("text").rlike("(^|\\s)c[0-9]+x\\S")).count()
      require(clashes == 0L,
        s"$clashes base docs contain tokens of the copy-marker form " +
          "c<digits>x…: scaled copies would collide with copy 0")
    }
    docs
      .withColumn("c", explode(sequence(lit(0), lit(factor - 1), lit(1))))
      .select(
        (col("doc_id") + col("c") * Stride).as("doc_id"),
        when(col("c") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("c"), col("c"), lit("x$1")))).as("text"),
        col("lang"), col("source"),
        // copy 0 is the identity: keep the base n_chars verbatim (the
        // harness value may legitimately differ from length(text))
        when(col("c") === 0, col("n_chars"))
          .otherwise(length(col("text"))).cast("long").as("n_chars"))
  }

  def scaleEmbeddings(embs: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    requireIdsBelowStride(embs, "vec_id")
    embs
      .withColumn("c", explode(sequence(lit(0), lit(factor - 1), lit(1))))
      .withColumn("r", pmod(col("c"), size(col("embedding"))))
      .select(
        (col("vec_id") + col("c") * Stride).as("vec_id"),
        concat(
          slice(col("embedding"), col("r") + 1, size(col("embedding")) - col("r")),
          slice(col("embedding"), lit(1), col("r"))).as("embedding"),
        col("label"))
  }

  /** Write the factor-F twin of `baseDir`'s documents/embeddings tables
    * under `outDir`, in the harness layout the `dir`-taking queries read. */
  def materialize(spark: SparkSession, baseDir: String, outDir: String,
                  factor: Int): Unit = {
    scaleDocuments(Tables.documents(spark, baseDir), factor)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(Tables.embeddings(spark, baseDir), factor)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  // ------------------------------------------------- candidate measures

  /** q41's raw LSH band-candidate volume (the self-join output BEFORE
    * verification) — the quantity banding keeps sub-quadratic. */
  def lshCandidateCount(spark: SparkSession, dir: String): Long = {
    // read the session-landed groups (shared with every LSH consumer)
    // instead of re-materializing a private checkpoint of the same frame
    val sets = Similarity.landedShingleGroups(spark, dir)
      .select(col("gid"), col("hs"))
    val banded = Similarity.bandKeys(sets, "gid")
    banded.select(col("bkey"), col("gid").as("gid_a"))
      .join(banded.select(col("bkey"), col("gid").as("gid_b")), Seq("bkey"))
      .filter(col("gid_a") < col("gid_b"))
      .count()
  }

  /** q143's PPJoin prefix-filter candidate volume (distinct rep pairs
    * entering verification). */
  def containmentCandidateCount(spark: SparkSession, dir: String): Long =
    Similarity.containmentCandidates(Similarity.containmentSets(spark, dir))
      .count()

  /** q118's within-cluster comparison volume Σₖ mₖ(mₖ−1)/2 under cluster
    * count `k` — the SemDeDup production shape scales k with the corpus
    * so this stays linear in N. */
  def semanticPairVolume(spark: SparkSession, dir: String, k: Int): Long = {
    val (a2, _) = Similarity.kmeansAssignment(spark, dir, k)
    val r = a2.groupBy(col("cid")).agg(count(lit(1)).as("m"))
      // integer division (div), not /: the double quotient loses
      // exactness past 2^53 — against the whole point of the measurement
      .agg(sum(expr("m * (m - 1) div 2")).cast("long")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
