package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table layout for scale: partitioned writes and the pruning they buy.
  *
  * At 100 TB the single biggest lever after column pruning is never
  * listing, let alone reading, irrelevant files. Hive-style partitioning
  * (`write.partitionBy`) makes a predicate on the partition column a
  * DIRECTORY filter — `PartitionFilters` in the scan, zero I/O for pruned
  * partitions — and pairs with AQE's dynamic partition pruning for join
  * keys. The reference's folder-per-dataset model (`os.listdir` of one
  * directory) is the degenerate single-partition case of exactly this.
  *
  * Guidance encoded here rather than left to callers:
  *  - partition by LOW-cardinality columns only (a date, a language, a
  *    split) — one directory per value; thousands of values = small-file
  *    death;
  *  - repartition by the partition column before writing so each partition
  *    directory gets few, large files instead of one file per task.
  */
object Layout {

  /** Write `df` Hive-partitioned by `cols`, one shuffle to co-locate rows
    * of a partition (maxes file size, avoids task×partition file blowup). */
  def writePartitioned(df: DataFrame, outDir: String, cols: Seq[String],
                       mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(cols.map(col): _*)
      .write.mode(mode).partitionBy(cols: _*).parquet(outDir)
  }

  /** Read a partitioned layout back; predicates on the partition columns
    * prune directories at planning time (visible as PartitionFilters). */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Write `df` as a BUCKETED catalog table: rows are hash-partitioned
    * into `numBuckets` files per partition by `bucketCol`, and the bucket
    * spec is recorded in the catalog. A join or aggregation keyed on the
    * bucket column then reads each bucket as a pre-shuffled partition —
    * NO exchange on that side (spec-asserted in LayoutSpec). This is the
    * co-located-join lever for 100 TB fact tables: pay the shuffle once
    * at write time, never again across the many reads.
    *
    * Bucketing requires the catalog (bucket metadata lives there, not in
    * the files), hence saveAsTable rather than a path write. Pair fact
    * tables bucketed on the SAME key and count so fact-fact joins are
    * exchange-free on both sides; sortBy within buckets additionally
    * enables merge joins without a sort. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w)
      .format("parquet").saveAsTable(table)
  }
}
