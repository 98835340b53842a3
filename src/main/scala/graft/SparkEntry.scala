package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a QueryDef in one of the module
  * registries below; SQL-expressible ones also carry a DuckDB oracle query
  * that the driver hash-compares at sf0.01.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    relational.Relational.defs ++
      relational.Events.defs ++
      text.TextOps.defs ++
      text.CorpusStats.defs ++
      text.FileWorkflowStats.defs ++
      images.Geometry.defs ++
      llm.Similarity.defs ++
      io.Layout.defs ++
      io.Versioning.defs ++
      io.Formats.defs ++
      multimodal.Fixtures.defs ++
      images.Perceptual.defs ++
      web.Web.defs ++
      web.CrawlGraph.defs ++
      web.CrawlIngest.defs ++
      web.PdfExtract.defs ++
      web.Revisit.defs ++
      web.Traps.defs ++
      web.Feed.defs ++
      web.HttpCache.defs ++
      llm.Sft.defs ++
      llm.Dpo.defs ++
      llm.Ingest.defs ++
      text.UnicodeNorm.defs ++
      text.Secrets.defs ++
      text.EpochBuild.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
