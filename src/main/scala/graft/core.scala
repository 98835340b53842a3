package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One registered engine operation: a Spark build function plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query.
  * The driver hash-compares the two at sf0.01 (see Verify.scala).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans; Catalyst pushes filters/projections
  * down to the scan, so callers should NOT pre-materialize or cache here.
  * At cluster scale these would be partitioned/bucketed catalog tables;
  * the API is the same.
  */
object Tables {

  /** Money/rate/quantity columns the engine computes on as DOUBLE, and
    * date columns it reads as TIMESTAMP_NTZ. The harness regenerated its
    * parquet once with a changed physical encoding (events.ts,
    * round 5→6) and will plausibly do it again; these two column families
    * are where a re-encode (DECIMAL-typed money, DATE-typed dates) would
    * otherwise break every downstream query at analysis or silently
    * change aggregate types. */
  private val moneyCols = Set(
    "c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "value")
  private val dateCols = Set("o_orderdate", "l_shipdate")

  /** Normalize DRIFTED physical column types back to the canonical
    * schema the engine (and every oracle) was built against. A no-op on
    * today's files — each cast fires only when the observed type
    * differs — so current behavior is bit-identical; on a re-encoded
    * file, money lands back at DOUBLE (exact for the ≤2-decimal values
    * present) and dates at TIMESTAMP_NTZ (exact: the harness dates are
    * all midnight-valued, verified at sf0.01). DuckDB oracles read the
    * same drifted file directly and agree value-for-value — decimal
    * money enters the same DECIMAL(14,4) exact-arithmetic casts, and
    * DATE comparisons against TIMESTAMP literals are well-defined
    * there. The ts column of `events` has its own multi-encoding
    * branch in [[events]]. */
  private def canonicalize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, TimestampNTZType}
    val needs = df.schema.fields.exists(f =>
      (moneyCols(f.name) && f.dataType != DoubleType) ||
        (dateCols(f.name) && f.dataType != TimestampNTZType))
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      if (moneyCols(f.name) && f.dataType != DoubleType)
        col(f.name).cast(DoubleType).as(f.name)
      else if (dateCols(f.name) && f.dataType != TimestampNTZType)
        col(f.name).cast(TimestampNTZType).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    canonicalize(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** The harness has shipped `events.ts` under several physical parquet
    * encodings across regenerations, so the loader normalizes every one of
    * them to a session-TZ TIMESTAMP (all downstream call sites use
    * `unix_micros(ts)` and event-time windows, which require it):
    *
    *  - TIMESTAMP(NANOS): Spark 4 cannot read it natively; with
    *    spark.sql.legacy.parquet.nanosAsLong=true (set in
    *    Verify/Bench/tests) it arrives as LONG nanoseconds — truncate to
    *    microseconds exactly as DuckDB does reading the same file.
    *  - timestamp[us] WITHOUT timezone: Spark 4 reads TIMESTAMP_NTZ, on
    *    which `unix_micros`/watermarks fail analysis. Cast to
    *    TimestampType: the sessions that reach oracles force UTC, so the
    *    wall-clock micros are bit-identical to DuckDB's read of the file.
    *  - timestamp[us] WITH timezone (TIMESTAMP_LTZ): already the target
    *    type — pass through.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))

  /** The ts-encoding branch, shared with the STREAMING reader
    * ([[graft.streaming.Streaming.readEventStream]]): a file-source
    * stream must declare the RAW physical schema (declaring the
    * normalized one against NTZ files is a reader type mismatch) and
    * apply this transform on the streaming frame instead. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Distributed equivalents of inherently-sequential operations. */
object Dist {
  import org.apache.spark.sql.expressions.Window

  /** Post-hoc diagnosability for the range-partitioned utilities: when
    * enabled (`SPARK_GRAFT_DIST_DIGEST=1` or `-Dgraft.dist.digest=true`),
    * every [[globalRowNumber]]/[[globalCumSum]] call records one line —
    * `tag pid:rows:minKey:maxKey|…` over the MATERIALIZED range
    * partitioning — into a bounded in-memory log that Verify drains per
    * query and dumps as `dist_digest.json`. A driver-side hash mismatch
    * on a Dist-based query is then diagnosable against the exact
    * partitioner boundaries that run sampled, instead of being
    * unreproducible after the fact. Off by default: recording costs one
    * extra numParts-row action per call (the checkpoint makes it cheap,
    * but bench runs must not pay it). */
  private val digests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def digestOn: Boolean =
    sys.env.get("SPARK_GRAFT_DIST_DIGEST").contains("1") ||
      sys.props.get("graft.dist.digest").contains("true")
  def drainDigests(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var s = digests.poll()
    while (s != null) { b += s; s = digests.poll() }
    b.result()
  }
  private def recordDigest(tag: String, parted: DataFrame, key: Column): Unit =
    if (digestOn) {
      val rows = parted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("n"), min(key.cast("string")).as("lo"),
          max(key.cast("string")).as("hi"))
        .orderBy(col("__pid")).collect()
      digests.add(rows.map(r => s"${r.get(0)}:${r.get(1)}:${r.get(2)}:${r.get(3)}")
        .mkString(s"$tag ", "|", ""))
    }

  /** Global 1-based row number ordered by a unique `key`, WITHOUT the
    * single-partition window (`Window.orderBy(key)` moves every row to one
    * task — Spark's own WindowExec warning; fatal at 100 TB).
    *
    * Shape: range-repartition on the key (partition i holds keys < partition
    * i+1's), per-partition `row_number` over the local sort, then add each
    * partition's cumulative predecessor count via a tiny (numPartitions-row)
    * broadcast join. Result column: `rn`.
    *
    * The range exchange samples the child to pick boundaries — same cost
    * model as a global orderBy, but the window itself stays parallel. */
  def globalRowNumber(df: DataFrame, key: Column, numParts: Int = 32): DataFrame = {
    // The partitioned frame MUST be checkpointed: the data branch and the
    // offsets branch both contain the range exchange, and if the planner
    // re-executes it instead of reusing the stage, RangePartitioner
    // re-SAMPLES boundaries with a fresh RDD-id-derived seed — the two
    // branches then disagree on which keys live in which __pid and the
    // offsets join corrupts the numbering (observed as overlapping
    // buckets in q115 before the fix). One materialized RDD makes the
    // pid→range mapping consistent by construction.
    val parted = df.repartitionByRange(numParts, key)
      .withColumn("__pid", spark_partition_id())
      .transform(durableCkpt)
    recordDigest("rowNumber", parted, key)
    val local = parted.withColumn("__local_rn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(key)))
    val offsets = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("rn", col("__offset") + col("__local_rn"))
      .drop("__pid", "__local_rn", "__offset")
  }

  /** numParts resolution shared by the range-partitioned helpers:
    * positive = caller's explicit choice; ≤ 0 = derive from the data as
    * max(session default parallelism, the child's planned partitions). */
  private[graft] def autoParts(df: DataFrame, numParts: Int): Int =
    if (numParts > 0) numParts
    else math.max(df.sparkSession.sparkContext.defaultParallelism,
      df.rdd.getNumPartitions)

  /** 1-based row number WITHIN a partition column, ordered by a unique
    * `key`, without ever materializing one partition value on one task —
    * the hot-key-safe form of `row_number().over(Window.partitionBy(part)
    * .orderBy(key))`. A plain window ships EVERY row of a partition value
    * to a single task: fine when values are small (q212's five fixture
    * hosts), fatal when one is hot (at web scale a single hot domain's
    * fetch queue would serialize its schedule into one task — the q212
    * SURVEY caveat this closes).
    *
    * Shape: range-repartition on (part, key) — rows of one part value
    * occupy a CONTIGUOUS run of partitions, sorted by key across them —
    * then a (\_\_pid, part) local row_number, plus each (pid, part)'s
    * predecessor count within its part. The offsets attach stays a tiny
    * broadcast by a boundedness argument one step beyond
    * [[globalRowNumber]]'s: a (pid, part) cell needs a NONZERO offset only
    * when an earlier pid also holds that part — i.e. the part SPANS a
    * partition boundary — and ≤ numParts−1 boundaries exist, so ≤
    * numParts−1 rows carry a nonzero offset regardless of |parts| or
    * skew. Cells absent from the broadcast coalesce to 0. Result column:
    * `rn` (1-based within `part`).
    *
    * `numParts` ≤ 0 (the default) derives the count from the DATA:
    * max(session default parallelism, the child's planned partitions) —
    * a fixed 32 would under-parallelize a 256-core cluster and
    * over-partition a tiny frame (r11 verdict task 7). The result is
    * partitioning-invariant (rn is defined by the key ordering alone),
    * so the choice moves only cost, never hashes. The boundary-spill
    * bound scales with it: ≤ numParts−1 rows broadcast either way. */
  def globalRowNumberWithin(df: DataFrame, partCol: String, key: Column,
      numParts: Int = 0): DataFrame = {
    val nParts = autoParts(df, numParts)
    // checkpointed for globalRowNumber's reason: both branches must read
    // ONE materialized range partitioning or re-sampled boundaries
    // corrupt the offsets join
    val parted = df.repartitionByRange(nParts, col(partCol), key)
      .withColumn("__pid", spark_partition_id())
      .transform(durableCkpt)
    recordDigest("rowNumberWithin", parted, struct(col(partCol), key))
    val local = parted.withColumn("__local_rn",
      row_number().over(
        Window.partitionBy(col("__pid"), col(partCol)).orderBy(key)))
    val spill = parted.groupBy(col("__pid"), col(partCol))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(col(partCol)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__offset") > 0) // ≤ numParts−1 rows by construction
      .select(col("__pid"), col(partCol), col("__offset"))
    local.join(broadcast(spill), Seq("__pid", partCol), "left")
      .withColumn("rn", coalesce(col("__offset"), lit(0L)) + col("__local_rn"))
      .drop("__pid", "__local_rn", "__offset")
  }

  /** Global weighted running sum ordered by a unique `key` — the weighted
    * sibling of [[globalRowNumber]], same shape, same reason: a
    * `Window.orderBy(key)` cumsum moves every row to one task. Range
    * partition on the key, per-partition local cumsum, then add each
    * partition's total-weight predecessor sum via the tiny broadcast
    * offsets join. The partitioned frame is checkpointed for the same
    * reason as [[globalRowNumber]] — both branches must read ONE
    * materialized range partitioning, or a re-sampled exchange corrupts
    * the offsets. Result column: `cum` (inclusive of the current row's
    * weight). */
  def globalCumSum(df: DataFrame, key: Column, weight: Column,
      numParts: Int = 32): DataFrame = {
    val parted = df.withColumn("__w", weight.cast("long"))
      .repartitionByRange(numParts, key)
      .withColumn("__pid", spark_partition_id())
      .transform(durableCkpt)
    recordDigest("cumSum", parted, key)
    val local = parted.withColumn("__local_cum",
      sum(col("__w")).over(Window.partitionBy(col("__pid")).orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = parted.groupBy(col("__pid")).agg(sum(col("__w")).as("__tot"))
      .withColumn("__offset",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum", col("__offset") + col("__local_cum"))
      .drop("__pid", "__local_cum", "__offset", "__w")
  }

  /** TWO global running sums over the SAME key ordering in one pass —
    * for consumers that need a pair of cumulative series (q166's
    * cum_types/cum_tokens): chaining [[globalCumSum]] twice pays two
    * range exchanges, two checkpoints and two window passes over the
    * identical partitioning; the sums are independent per row, so one
    * partitioning serves both (guide §2.4 — operations keyed the same
    * way share one exchange). Result columns: `cum1`, `cum2`
    * (inclusive). Equivalence to the chained form is spec-locked
    * (DistSpec). */
  def globalCumSum2(df: DataFrame, key: Column, w1: Column, w2: Column,
      numParts: Int = 32): DataFrame = {
    val parted = df.withColumn("__w1", w1.cast("long"))
      .withColumn("__w2", w2.cast("long"))
      .repartitionByRange(numParts, key)
      .withColumn("__pid", spark_partition_id())
      .transform(durableCkpt)
    recordDigest("cumSum2", parted, key)
    val w = Window.partitionBy(col("__pid")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted
      .withColumn("__lc1", sum(col("__w1")).over(w))
      .withColumn("__lc2", sum(col("__w2")).over(w))
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("__w1")).as("__t1"), sum(col("__w2")).as("__t2"))
      .withColumn("__o1",
        coalesce(sum(col("__t1")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__o2",
        coalesce(sum(col("__t2")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__o1"), col("__o2"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum1", col("__o1") + col("__lc1"))
      .withColumn("cum2", col("__o2") + col("__lc2"))
      .drop("__pid", "__lc1", "__lc2", "__o1", "__o2", "__w1", "__w2")
  }

  /** Unlock multi-core compute above an UNSPLITTABLE scan: repartition to
    * the session's default parallelism IFF the frame currently plans fewer
    * partitions (on splittable many-row-group inputs this is a no-op by
    * the partition-count test). The harness parquet is written as ONE row
    * group per table, so file-range splitting cannot parallelize those
    * scans (a split that contains no row-group midpoint reads zero rows)
    * and everything upstream of the first exchange runs on one core.
    *
    * Measured guidance, revised after the r11 sf1 sweep: do NOT apply
    * this routinely at SMALL scale — the round-robin exchange re-ships
    * the rows once from the single scan task and breaks
    * scan→kernel→partial-agg stage fusion, and at sf0.1 that cost ≥ the
    * parallelism gain for cheap kernels (2026-08-12: q41 2.42→2.83s,
    * q07's agg 1.44→1.27s, rest neutral). But the break-even moves with
    * DATA VOLUME, not just per-row cost: at sf1 every kernel-heavy
    * query pinned to the one-task scan ran ~linearly in corpus size on
    * one core, and fanning out cut the slow tier 3–8× (2026-08-16,
    * isolated min-of-3: q54 11.0→1.3s, q104 11.5→1.4s, q188 11.0→1.6s,
    * q191 11.4→2.3s, q94 9.2→2.4s, q190 7.0→1.5s, q222 6.0→1.5s, …).
    * Rule of thumb: fan out when per-row compute ≫ per-row bytes
    * (regex/hash/codec/scoring kernels, n-gram explodes); leave plain
    * column-arithmetic aggregates fused. On a real cluster the landed
    * corpus is many-files/many-row-groups and this is a no-op by the
    * partition-count test. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Per-(session, plan) memo of measured (rows, storageBytes) for
    * [[sizedBroadcast]] — the same materialized frame is attach-joined by
    * several consumers per session; one count, not one per plan build.
    * A [[SessionMemo]], not a raw map (r12 judge task 3): keys strongly
    * retain the SparkSession and analyzed plans (which pin RDDs), so an
    * unbounded map was the same process-lifetime retention class the r9
    * SessionMemo cap closed — capped at [[SessionMemos.MaxEntries]] and
    * released by `SessionMemos.clearAll`, like the landed-frame memos. */
  private val sizeMemo = new SessionMemo[
    (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    (Long, Long)]

  /** Runtime-size-DECIDED broadcast of an already-materialized
    * (checkpointed/memoized) frame: broadcast-hint it only when its
    * MEASURED size fits under the bounds, else return it unchanged for a
    * shuffle join. This replaces the two bad extremes the r11 round left
    * behind (judge task 1): an unconditional hint is a size CLAIM that
    * OOMs at 100 TB if the frame grows with the corpus (the banned q218
    * class), while an unconditional shuffle makes measurably-tiny
    * checkpointed frames — stats-less LogicalRDDs the planner will never
    * auto-broadcast — pay two exchanges at small scale (q41 +23%, q147
    * +21% at sf0.1 from the r11 class removal).
    *
    * The measurement is nearly free by the call-site contract: the frame
    * is already materialized (a durableCkpt the caller counts anyway or a
    * session-landed memo), so `count()` reads cached blocks. Bytes come
    * from the block manager's storage info for the checkpoint's RDD — the
    * deserialized block size, a deliberate OVERESTIMATE of the broadcast's
    * tungsten bytes. When no storage info exists (reliable-checkpoint
    * frames live on the cluster FS, not the block manager; schema-default
    * estimates underestimate array columns ~100x) the fallback is a much
    * smaller rows-only bound rather than a guessed byte count.
    *
    * The measurement is the broadcast's WITNESS, not just its trigger:
    * an approved frame's checkpoint-RDD ids land in [[approvedRdds]]
    * with the measured numbers, and PlanHygieneSpec's broadcast-bound
    * rule accepts a hinted side whose LogicalRDD leaves are all approved
    * — no hand-declared whitelist entry, and no plan-level artifact
    * either (an earlier draft hinted `broadcast(df.limit(maxRows))` so
    * the plan carried a GlobalLimit bound structurally, but the limit
    * plans a LocalLimit → single-partition exchange → GlobalLimit chain
    * that re-ships the whole build side through ONE task before the
    * broadcast collect — measured at sf0.1 it gave back most of the
    * broadcast win it existed to recover). At scale the same call sites
    * degrade to the shuffle join automatically the moment the
    * measurement crosses the bound — a runtime bound, not a builder's
    * claim. */
  def sizedBroadcast(df: DataFrame, maxRows: Int = 1 << 20,
                     maxBytes: Long = 128L << 20): DataFrame = {
    val spark = df.sparkSession
    val rddLeaves = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    val rddIds = rddLeaves.map(_.id).toSet
    val (rows, bytes) = sizeMemo.getOrCompute(
      (spark, df.queryExecution.analyzed)) { _ =>
        val n = df.count()
        val stored = spark.sparkContext.getRDDStorageInfo
          .filter(i => rddIds.contains(i.id))
          .map(i => i.memSize + i.diskSize).sum
        val measured =
          if (stored > 0) stored
          else {
            // RELIABLE-checkpoint frames live on the cluster FS, not the
            // block manager — exactly the documented cluster config, where
            // the old rows-only fallback had NO byte bound at all (r12
            // ADVICE: 65k rows of unbounded array columns can still be a
            // multi-hundred-MB broadcast build). The count() above forced
            // the lazy checkpoint, so the files exist: their summed
            // length is the SERIALIZED frame size — within a small
            // constant of the broadcast's transfer size, and a real byte
            // witness where none existed.
            val conf = spark.sparkContext.hadoopConfiguration
            rddLeaves.flatMap(r => r.getCheckpointFile).map { d =>
              val p = new org.apache.hadoop.fs.Path(d)
              val fs = p.getFileSystem(conf)
              if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
            }.sum
          }
        (n, measured)
      }
    val fits =
      if (bytes > 0) rows <= maxRows && bytes <= maxBytes
      else rows <= math.min(maxRows.toLong, 65536L) // unmeasurable bytes
    if (fits) {
      val app = spark.sparkContext.applicationId
      rddIds.foreach(id => approved.getOrCompute((app, id))(_ => (rows, bytes)))
      broadcast(df)
    } else df
  }

  /** Checkpoint-RDD ids [[sizedBroadcast]] measured UNDER its bounds (and
    * therefore hinted), with the measured (rows, storageBytes) — the
    * runtime-bound witness PlanHygieneSpec's broadcast-hygiene rule reads
    * in place of a hand-declared bound. Keyed by (applicationId, rddId):
    * RDD ids restart from 0 with a new SparkContext, so without the
    * discriminator a stale approval from a previous context could vouch
    * for an unrelated RDD (r12 ADVICE). A [[SessionMemo]]: capped and
    * released by `SessionMemos.clearAll` like every session registry. */
  private val approved = new SessionMemo[(String, Int), (Long, Long)]

  /** Approved RDD ids for the GIVEN context's application — a stale id
    * from a restarted context never matches. */
  def approvedRdds(sc: org.apache.spark.SparkContext): Set[Int] = {
    val app = sc.applicationId
    approved.snapshotKeys.collect { case (`app`, id) => id }
  }

  /** Lazy lineage-truncating checkpoint that survives executor loss when it
    * can: RELIABLE checkpoint (files on the cluster FS) when a checkpoint
    * dir is set — `SparkContext.setCheckpointDir` or `spark.checkpoint.dir`
    * — and `localCheckpoint` otherwise. The iterative operators (label
    * propagation q55/q67, k-means q75) need lineage truncation either way
    * (their plans grow 4^rounds without it), but `localCheckpoint` blocks
    * live only on executors: at cluster scale one lost executor kills the
    * job mid-iteration with no recompute path. With a checkpoint dir the
    * blocks are re-readable from the cluster FS, so the loop survives
    * executor loss at the cost of one FS write per truncation. local[32]
    * (tests, driver) sets no dir → keeps the zero-IO local path. */
  def durableCkpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** Skew-mitigating equi-join: salt the big (skewed) side with
    * `pmod(saltSource, factor)` and replicate the small side `factor`
    * times, so one hot key's rows spread over `factor` reducers instead of
    * one straggler task. `saltSource` must vary within a key (a unique id,
    * or `xxhash64` of distinguishing columns) and be deterministic — never
    * `rand()`, which breaks retries and oracle comparison.
    *
    * AQE's skew-join handles SORT-MERGE skew automatically; explicit
    * salting remains the tool when the skew is in an aggregation key or
    * AQE's split thresholds don't trigger. Result equals
    * `big.join(small, keys)` exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(saltSource, lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1), lit(1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** The q131 skew audit's `rec_salt` as a reusable measurement:
    * ⌈max_cnt / avg_cnt⌉ over the join key's count distribution — how
    * many average-key volumes the hottest key spans, which is exactly
    * the number of reducers it must spread over to level with the rest.
    * Returns 1 on uniform keys (no salting needed). The measurement is
    * one two-level hash aggregate ending in a bounded ONE-ROW action;
    * at 100 TB it runs on yesterday's key-stats table, not inline —
    * pass that factor straight to [[saltedJoin]] instead. */
  def recommendedSalt(df: DataFrame, keys: Seq[String]): Int = {
    // DECIMAL(38,0) products: max_cnt·n_keys overflows int64 exactly at
    // the 100 TB scale this audit targets (1e10 rows on a hot key ×
    // 1e9 keys), where a silent wrap would return 1 — no salting — when
    // skew is worst. Empty input yields a NULL aggregate row → 1 (the
    // plain join is trivially level).
    val r = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
        max(col("cnt")).as("max_cnt"))
      .selectExpr(
        """cast((cast(max_cnt as decimal(38,0)) * n_keys + total - 1)
          |  div total as int)""".stripMargin)
      .head()
    if (r.isNullAt(0)) 1 else math.max(1, r.getInt(0))
  }

  /** Measure-then-act skew join: [[saltedJoin]] with the factor the
    * skew audit recommends for THIS big side, closing the q131→q89
    * loop (q89's hardcoded factor 8 was a guess; this computes it).
    * Degenerates to the plain equi-join when the keys are level —
    * salting a uniform key only pays the small-side replication. */
  def auditedSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                        saltSource: Column): DataFrame = {
    val factor = recommendedSalt(big, keys)
    if (factor <= 1) big.join(small, keys)
    else saltedJoin(big, small, keys, saltSource, factor)
  }
}

/** Exact-arithmetic helpers shared by queries and their DuckDB oracles.
  *
  * The harness data stores money/rates as doubles with <= 2 decimal digits.
  * Summing doubles is order-dependent (Spark's shuffle order differs from
  * DuckDB's scan order), so aggregates would not hash-match. Casting each
  * operand to DECIMAL(p,4) first is exact (scale 4 > the 2 decimals present,
  * so no rounding ever happens), decimal addition is associative, and the
  * final CAST(... AS DOUBLE) of identical decimal values is identical in
  * both engines. Keep Spark decimal precision <= 38 at every intermediate
  * step or Spark will silently round (DuckDB won't) and the hashes diverge.
  */
object Exact {
  /** money/quantity operand: DECIMAL(14,4), exact for 2-dec doubles. */
  def dec(c: Column): Column = c.cast(DecimalType(14, 4))
  /** small rate operand (discount/tax in [0,1]): DECIMAL(6,4). */
  def rate(c: Column): Column = c.cast(DecimalType(6, 4))
  /** exact sum of a money column, surfaced as DOUBLE. */
  def sumMoney(c: Column): Column = sum(dec(c)).cast("double")
  /** l_extendedprice * (1 - l_discount), exact decimal. */
  def discPrice(price: Column, disc: Column): Column =
    dec(price) * (lit(1) - rate(disc))
  /** price*(1-disc)*(1+tax): the inner product has <= 4 decimals, so the
    * DECIMAL(20,6) re-cast is exact and keeps Spark's precision <= 38. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    discPrice(price, disc).cast(DecimalType(20, 6)) * (lit(1) + rate(tax))

  /** Collapse an exact wide-decimal SUM to an int64-backed DECIMAL(18,s)
    * before surfacing as DOUBLE. The sum itself is exact in both engines,
    * but converting a 128-bit-backed decimal to double is two roundings in
    * DuckDB (int128→double, then /10^s) vs one exact conversion in Java —
    * they can land one ulp apart (observed on q01 sum_charge at sf0.1).
    * With width ≤ 18 the backing integer is an int64 < 2^53, so int→double
    * is exact and the single divide is correctly rounded — identical in
    * both engines. `s` must be the value's TRUE decimal count so the
    * narrowing cast never rounds. SQL twin: CAST(CAST(SUM(…) AS
    * DECIMAL(18,s)) AS DOUBLE). */
  def narrow(sum: Column, s: Int): Column =
    sum.cast(DecimalType(18, s)).cast("double")

  /** Integer cents of a 2-decimal money double, with NO engine rounding
    * semantics in play: the DECIMAL(14,4) cast is exact for 2-dec doubles
    * and ×100 keeps the value integral, so the BIGINT cast moves nothing.
    * Replaces the `round(x·100)` DOUBLE idiom, whose half-way behaviour
    * is an engine property rather than decimal arithmetic. SQL twin:
    * `CAST(CAST(x AS DECIMAL(14,4)) * 100 AS BIGINT)`. */
  def cents(c: Column): Column = (dec(c) * 100).cast("long")

  /** Discounted revenue in integer MICRO-dollars: cents(price) ×
    * (10000 − disc_bp). price has ≤2 decimals and disc ≤4, so both
    * factors are exactly integral and the product carries NO rounding of
    * any kind — unlike the retired `round(discPrice·100, 0)` cents idiom,
    * whose half-cent ties were resolved differently by Spark
    * (HALF_UP), DuckDB, and a double-based model (q112 was red two
    * driver rounds on exactly those ties). Sums of this unit can exceed
    * int64 at 100 TB scale, so aggregate it as DECIMAL(38,0)
    * (see q112). SQL twin: `CAST(CAST(p AS DECIMAL(14,4)) * 100 AS
    * BIGINT) * (10000 - CAST(CAST(d AS DECIMAL(6,4)) * 10000 AS
    * BIGINT))`. */
  def discMicros(price: Column, disc: Column): Column =
    cents(price) * (lit(10000L) - (rate(disc) * 10000).cast("long"))
}
