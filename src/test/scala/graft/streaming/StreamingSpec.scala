package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream agreement: the streaming transforms produce the same
  * answers as their batch twins on identical input (the real events table
  * at sf0.001, fed through a MemoryStream in two micro-batches). */
class StreamingSpec extends SparkSpec {

  private def eventRows(): Seq[Streaming.EventRow] = {
    graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Streaming.EventRow(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("streaming path triples match the batch q138 triple set on identical input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 30L * 60 * 1000000
    val rows = eventRows().sortBy(e => (e.ts.getTime, e.event_id))
    // time-ordered halves keep batch 2 above batch 1's watermark, so the
    // late-row filter drops nothing and stream input ≡ batch input
    val (first, second) = rows.splitAt(rows.size / 2)
    val sentinelTs = new java.sql.Timestamp(rows.last.ts.getTime + 4L * 3600 * 1000)
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.pathTriples(stream.toDF())
      .writeStream.format("memory").queryName("t_paths")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      // sentinel advances the watermark past every real event; timeouts
      // flush the remaining pending triples on the next trigger
      stream.addData(Streaming.EventRow(-1L, sentinelTs, -1L, "sentinel", 0.0))
      q.processAllAvailable()
      stream.addData(Streaming.EventRow(-2L,
        new java.sql.Timestamp(sentinelTs.getTime + 3600 * 1000), -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_paths")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq.sorted
    // batch model: per-user consecutive triples under the same gap bound
    val model = rows.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val s = es.sortBy(e => (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000,
        e.event_id)).toSeq
      def us(e: Streaming.EventRow) =
        e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
      s.sliding(3).filter(_.lengthCompare(3) == 0).flatMap { w =>
        if (us(w(1)) - us(w(0)) <= gapUs && us(w(2)) - us(w(1)) <= gapUs)
          Some((uid, w(0).event_id, w(0).event_type, w(1).event_type, w(2).event_type))
        else None
      }
    }.sorted
    assert(got.nonEmpty && got == model,
      s"stream ${got.size} triples vs batch ${model.size}")
  }

  test("streaming activity islands match the batch q156 per-user aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val spanUs = 5L * 60 * 1000000
    val rows = eventRows().sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = rows.splitAt(rows.size / 2)
    val sentinelTs = new java.sql.Timestamp(rows.last.ts.getTime + 4L * 3600 * 1000)
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.activityIslands(stream.toDF())
      .writeStream.format("memory").queryName("t_islands")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      stream.addData(Streaming.EventRow(-1L, sentinelTs, -1L, "sentinel", 0.0))
      q.processAllAvailable()
      stream.addData(Streaming.EventRow(-2L,
        new java.sql.Timestamp(sentinelTs.getTime + 3600 * 1000), -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val islands = spark.table("t_islands").filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // every island emitted exactly once: starts are unique per user
    assert(islands.map(i => (i._1, i._2)).distinct.size == islands.size)
    // batch island model (the q156 spec's sweep, kept per-island)
    val model = rows.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val starts = es.sortBy(e => (e.ts.getTime * 1000 +
        (e.ts.getNanos / 1000) % 1000, e.event_id))
        .map(e => e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000)
      var acc = List.empty[(Long, Long, Long)]
      starts.foreach { s =>
        acc = acc match {
          case (is, ie, n) :: rest if s <= ie =>
            (is, math.max(ie, s + spanUs), n + 1) :: rest
          case _ => (s, s + spanUs, 1L) :: acc
        }
      }
      acc.map(i => (uid, i._1, i._2, i._3))
    }
    assert(islands.sorted == model.sorted && islands.nonEmpty)
    // and the streamed islands aggregate to exactly the q156 report
    val agg = islands.groupBy(_._1).toSeq.map { case (u, is) =>
      (u, is.size.toLong, is.map(_._4).sum,
        is.map(i => i._3 - i._2).sum, is.map(i => i._3 - i._2).max)
    }.sortBy(_._1)
    val batch = graft.relational.Events.activityCoverage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(agg == batch)
  }

  test("streaming burst alerts equal the batch q170 feed, each exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows().sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = rows.splitAt(rows.size / 2)
    val sentinelTs = new java.sql.Timestamp(rows.last.ts.getTime + 4L * 3600 * 1000)
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.burstAlerts(stream.toDF())
      .writeStream.format("memory").queryName("t_burst")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      stream.addData(Streaming.EventRow(-1L, sentinelTs, -1L, "sentinel", 0.0))
      q.processAllAvailable()
      stream.addData(Streaming.EventRow(-2L,
        new java.sql.Timestamp(sentinelTs.getTime + 3600 * 1000), -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_burst").filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // exactly-once: no (user, bucket) fires twice
    assert(got.map(a => (a._1, a._2)).distinct.size == got.size)
    val batch = graft.relational.Events.burstAlerts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted == batch.sorted && got.nonEmpty)
  }

  test("streaming trending items: exact when k covers the domain, MG bounds when it cannot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic skewed item stream: repeat each event's type
    // (event_id % 4) + 1 times so counts differ across items
    val items = eventRows().flatMap(e =>
      Seq.fill((e.event_id % 4).toInt + 1)(e.event_type))
    val (a, b) = items.splitAt(items.size / 2)
    def run(k: Int, nShards: Int, name: String): Seq[(Int, String, Long, Long)] = {
      val stream = MemoryStream[String]
      val q = Streaming.trendingItems(
          stream.toDF().select(col("value").as("item")), k, nShards)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val lastSeq = rows.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._5).max }
      rows.filter(r => r._5 == lastSeq(r._1)).map(r => (r._1, r._2, r._3, r._4))
    }
    val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    // ample k: every shard tracks its whole sub-domain with exact counts
    val ample = run(16, 4, "t_trend_ample")
    assert(ample.nonEmpty)
    ample.foreach { case (sh, it, est, _) =>
      assert(math.floorMod(it.hashCode, 4) == sh)
      assert(est == exact(it), s"ample-k MG must be exact: $it $est vs ${exact(it)}")
    }
    assert(ample.map(_._2).toSet == exact.keySet)
    assert(ample.map(_._4).distinct.sorted ==
      items.groupBy(i => math.floorMod(i.hashCode, 4)).values
        .map(_.size.toLong).toSeq.distinct.sorted)
    // tight k = 2, one shard: the decrement path runs; the MG theorems
    // hold regardless of how triggers sliced the stream
    val tight = run(2, 1, "t_trend_tight")
    val n = items.size.toLong
    assert(tight.size <= 2, "summary must never exceed k counters")
    tight.foreach { case (_, it, est, shardN) =>
      assert(shardN == n)
      assert(est <= exact(it), "MG estimate never overcounts")
      assert(exact(it) - est <= n / (2 + 1), "MG undercount bounded by n/(k+1)")
    }
    val tracked = tight.map(_._2).toSet
    exact.foreach { case (it, c) =>
      if (c > n / 3) assert(tracked(it), s"true heavy hitter $it ($c > n/3) must be tracked")
    }
  }

  test("streaming tumbling windows match the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val stream = MemoryStream[Streaming.EventRow]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first); stream.addData(second)
    Streaming.runToMemory(Streaming.tumbling(stream.toDF()), "t_tumbling",
      OutputMode.Complete())
    val streamed = spark.table("t_tumbling")
      .orderBy("win_start", "event_type").collect().toSeq
    val batch = graft.relational.Events.tumbling(spark, sfDir).collect().toSeq
    assert(streamed == batch)
  }

  test("streaming session windows match batch session_window aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Streaming.EventRow]
    stream.addData(eventRows())
    Streaming.runToMemory(Streaming.sessions(stream.toDF()), "t_sessions",
      OutputMode.Complete())
    val streamed = spark.table("t_sessions")
      .orderBy("user_id", "sess_start").collect().toSeq
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), graft.Exact.sumMoney(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "sess_start").collect().toSeq
    assert(streamed == batch)
  }

  test("stream-stream attribution join matches the batch interval join (q64)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val stream = MemoryStream[Streaming.EventRow]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first); stream.addData(second)
    Streaming.runToMemory(Streaming.attributionJoin(stream.toDF()), "t_attrib",
      OutputMode.Append())
    val streamed = spark.table("t_attrib")
      .orderBy("purchase_id", "click_id").collect().toSeq
    val batch = graft.relational.Events.attributionJoin(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("left-outer stream-stream join: converting clicks emit on match, others on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) = Streaming.EventRow(
      id, java.sql.Timestamp.valueOf(t), uid, typ, v)
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.attributionJoinOuter(stream.toDF())
      .writeStream.format("memory").queryName("t_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 converts inside the 30-min window; user 2 never does
      stream.addData(
        ev(1, "2026-01-01 10:00:00", 1L, "click", 0.0),
        ev(2, "2026-01-01 10:10:00", 1L, "purchase", 9.5),
        ev(3, "2026-01-01 10:00:00", 2L, "click", 0.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("t_outer").collect()
      // the match can emit immediately; the null row CANNOT yet — nothing
      // proves user 2's window is over
      assert(afterBatch1.forall(!_.isNullAt(3)),
        "null-padded row emitted before the watermark proved no match")
      // advance event time far past 10:30 + 1h watermark delay — on BOTH
      // branches: the query's eviction watermark is the GLOBAL minimum
      // over every withWatermark node, and each branch only sees its own
      // event type, so a click alone leaves the purchase branch (and the
      // global watermark) behind
      stream.addData(ev(4, "2026-01-01 13:00:00", 3L, "click", 0.0),
        ev(5, "2026-01-01 13:00:00", 99L, "purchase", 1.0))
      q.processAllAvailable()
      // one more batch at the advanced watermark: null emission happens
      // as state expires, one trigger after the watermark moves
      stream.addData(ev(6, "2026-01-01 13:00:30", 3L, "click", 0.0),
        ev(7, "2026-01-01 13:00:30", 99L, "purchase", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_outer").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length == 1 && u1.head.getLong(3) == 2L && u1.head.getDouble(5) == 9.5)
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1, s"expected exactly one row for the non-converting click, got ${u2.length}")
    assert(u2.head.isNullAt(3) && u2.head.isNullAt(4) && u2.head.isNullAt(5),
      "non-converting click must emit null purchase columns")
  }

  test("foreachBatch materialized view: incremental merge equals batch recompute; untouched partitions not rewritten") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-mv")
    val statePath = s"$base/state"; val ckpt = s"$base/ckpt"
    def ev(id: Long, uid: Long, v: Double) = Streaming.EventRow(
      id, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), uid, "purchase", v)
    try {
      val stream = MemoryStream[Streaming.EventRow]
      val q = Streaming.maintainUserTotals(stream.toDF(), statePath, ckpt, nParts = 4)
      try {
        // batch 1: users 1 (pid 1), 2 (pid 2), 5 (pid 1)
        stream.addData(ev(1, 1L, 10.5), ev(2, 2L, 1.25), ev(3, 5L, 3.0))
        q.processAllAvailable()
        // snapshot file states of pid=2's directory — batch 2 won't touch it
        def pidFiles(p: Int): Map[String, Long] = {
          val d = new java.io.File(s"$statePath/pid=$p")
          if (!d.exists()) Map.empty
          else d.listFiles().filter(_.isFile).map(f => f.getName -> f.lastModified).toMap
        }
        val pid2Before = pidFiles(2)
        assert(pid2Before.nonEmpty, "pid=2 must exist after batch 1")
        Thread.sleep(1100) // mtime granularity
        // batch 2: users 1 and 9 — pids 1 only; pid 2 untouched
        stream.addData(ev(4, 1L, 0.25), ev(5, 9L, 7.0))
        q.processAllAvailable()
        assert(pidFiles(2) == pid2Before,
          "partition untouched by the batch was rewritten")
      } finally q.stop()
      // invariant: incremental maintenance == full batch recompute, exactly
      val got = spark.read.parquet(statePath)
        .select(col("user_id"), col("n_events"),
          col("total_dec").cast("double").as("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expect = Set((1L, 2L, 10.75), (2L, 1L, 1.25), (5L, 1L, 3.0), (9L, 1L, 7.0))
      assert(got == expect, s"got $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(base.toFile)
    }
  }

  test("watermark finalizes windows and drops late data (Append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) = Streaming.EventRow(
      id, java.sql.Timestamp.valueOf(t), user_id = 1L, event_type = "click", value = v)
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.tumbling(stream.toDF())
      .writeStream.format("memory").queryName("t_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in window [10:00, 10:10)
      stream.addData(ev(1, "2026-01-01 10:01:00", 1.0), ev(2, "2026-01-01 10:05:00", 2.0))
      q.processAllAvailable()
      // batch 2: event at 12:00 advances the 1h watermark to 11:00 —
      // window [10:00, 10:10) finalizes and is emitted
      stream.addData(ev(3, "2026-01-01 12:00:00", 4.0))
      q.processAllAvailable()
      // batch 3: late event inside the closed window — must be DROPPED
      stream.addData(ev(4, "2026-01-01 10:06:00", 100.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_late").collect()
    val w10 = out.filter(_.getAs[java.sql.Timestamp]("win_start").toString.startsWith("2026-01-01 10:00"))
    assert(w10.length == 1, s"expected one finalized 10:00 window, got ${out.mkString(";")}")
    assert(w10.head.getAs[Long]("n_events") == 2, "late event leaked into the closed window")
    assert(w10.head.getAs[Double]("total_value") == 3.0)
    // the 12:00 window is still open (watermark 11:00 < 12:10) — not emitted
    assert(!out.exists(_.getAs[java.sql.Timestamp]("win_start").toString.startsWith("2026-01-01 12:00")))
  }

  test("stream-static enrichment join attaches the static profile to every event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows().take(100)
    // static side: per-user totals over the full batch table
    val profile = graft.Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
    val stream = MemoryStream[Streaming.EventRow]
    stream.addData(rows)
    Streaming.runToMemory(
      Streaming.enrichWithUserProfile(stream.toDF(), profile), "t_enrich",
      OutputMode.Append())
    val out = spark.table("t_enrich")
    assert(out.count() == rows.length)
    // every event's user exists in the profile -> no null enrichments
    assert(out.filter(col("hist_events").isNull).count() == 0)
    // spot-check one user's enrichment against the static aggregate
    val u = rows.head.user_id
    val expected = profile.filter(col("user_id") === u).collect().head.getLong(1)
    val got = out.filter(col("user_id") === u).select("hist_events").collect().head.getLong(0)
    assert(got == expected)
  }

  test("streaming dedup drops duplicate event_ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows().take(200)
    val stream = MemoryStream[Streaming.EventRow]
    stream.addData(rows)
    stream.addData(rows.take(50)) // exact replays in a later micro-batch
    Streaming.runToMemory(Streaming.dedupStream(stream.toDF()), "t_dedup",
      OutputMode.Append())
    val ids = spark.table("t_dedup").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.length == rows.length, s"expected ${rows.length} unique, got ${ids.length}")
    assert(ids.distinct.length == ids.length)
  }

  test("ingest dedup: within-stream and vs-static-corpus duplicates both dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val corpus = Seq((100L, "alpha beta"), (101L, "gamma delta"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    stream.addData(
      (1L, ts(1), "alpha beta"),      // exact dup of corpus → dropped
      (2L, ts(2), "epsilon zeta"),    // fresh → kept
      (3L, ts(3), "epsilon zeta"))    // within-batch dup of 2 → dropped
    stream.addData(
      (4L, ts(4), "epsilon zeta"),    // cross-batch dup of 2 → dropped
      (5L, ts(5), "gamma delta"),     // corpus dup → dropped
      (6L, ts(6), "eta theta"))       // fresh → kept
    Streaming.runToMemory(
      Streaming.ingestDedup(stream.toDF().toDF("doc_id", "ts", "text"), corpus),
      "t_ingest", OutputMode.Append())
    val kept = spark.table("t_ingest").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 6L), s"got $kept")
  }

  test("observe: per-batch ingest-quality metrics ride the stream without a second scan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val observed = Streaming.observeIngestQuality(
      stream.toDF().toDF("doc_id", "ts", "text"))
    val q = observed.writeStream.format("memory")
      .queryName("t_observe").outputMode("append").start()
    try {
      stream.addData((1L, ts(1), "alpha"), (2L, ts(2), ""), (3L, ts(3), "beta gam"))
      q.processAllAvailable()
      stream.addData((4L, ts(4), "x"))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest_quality")))
        .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("n_empty"),
          r.getAs[Long]("n_chars")))
        .filter(_._1 > 0) // empty trailing batches carry no data
      assert(metrics.map(_._1).sum == 4, s"all rows observed: $metrics")
      assert(metrics.map(_._2).sum == 1, "the planted empty text is counted")
      assert(metrics.map(_._3).sum == ("alpha" + "" + "beta gam" + "x").length)
      // the metrics are a free rider: the sink still received every row
      assert(spark.table("t_observe").count() == 4)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals match a batch groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Streaming.EventRow]
    stream.addData(eventRows())
    Streaming.runToMemory(Streaming.runningUserState(stream.toDF()),
      "t_state", OutputMode.Update())
    // last snapshot per user == batch totals
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val finalSnaps = spark.table("t_state")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "n_events").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(finalSnaps == batch)
  }

  test("flatMapGroupsWithState emits one row per CLOSED session, matching session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val maxTs = rows.map(_.ts.getTime).max
    val stream = MemoryStream[Streaming.EventRow]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    // flusher: one far-future event for a sentinel user advances the
    // watermark past every real session's (last_ts + gap), so all real
    // sessions time out and emit; the sentinel's own session stays open
    val flushTs = maxTs + (30 + 60 + 60) * 60000L
    stream.addData(Streaming.EventRow(-1L, new java.sql.Timestamp(flushTs), -1L, "flush", 0.0))
    val q = Streaming.sessionCloseEvents(stream.toDF())
      .writeStream.format("memory").queryName("t_closed")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_closed")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "sess_start", "sess_end", "n_events")
      .orderBy("user_id", "sess_start").collect().toSeq
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))
      .orderBy("user_id", "sess_start").collect().toSeq
    assert(streamed == batch,
      s"closed-session emission diverges: ${streamed.size} vs ${batch.size} sessions")
  }

  test("two late pre-session events within one gap merge into ONE session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long): java.sql.Timestamp = new java.sql.Timestamp(min * 60000L)
    val base = 24L * 60 // noon, in minutes
    // REAL micro-batch boundaries: the query is started first and
    // processAllAvailable() runs between addData calls (data added
    // before start() would all land in one batch with watermark 0).
    // batch 1: user 1 at 12:00 → open session [12:00, 12:30), watermark
    // after the batch = 11:00
    // batch 2: user 1 at 11:10 and 11:20 — above the watermark, both
    // disjoint-BEFORE the open session's envelope [11:30, 12:30], and
    // within one 30-min gap of each other: session_window merges them
    // into [11:10, 11:50). Emitting either immediately would split them.
    // batch 3: sentinel user -1 far in the future advances the watermark
    // past every real horizon so all real sessions time out and emit.
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.sessionCloseEvents(stream.toDF())
      .writeStream.format("memory").queryName("t_late_merge")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Streaming.EventRow(1L, ts(base), 1L, "a", 1.0))
      q.processAllAvailable()
      stream.addData(
        Streaming.EventRow(2L, ts(base - 50), 1L, "a", 2.0),
        Streaming.EventRow(3L, ts(base - 40), 1L, "a", 3.0))
      q.processAllAvailable()
      stream.addData(Streaming.EventRow(-1L, ts(base + 240), -1L, "flush", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_late_merge")
      .filter(col("user_id") =!= -1L)
      .select("sess_start", "sess_end", "n_events")
      .orderBy("sess_start").collect().toSeq
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
    val want = Seq(
      (ts(base - 50), ts(base - 40 + 30), 2L), // the merged late pair
      (ts(base), ts(base + 30), 1L))
    assert(got == want, s"expected $want, got $got")
  }

  test("a late event bridging two open sessions merges them into one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long): java.sql.Timestamp = new java.sql.Timestamp(min * 60000L)
    val base = 24L * 60
    // batch 1: 12:00 → open A=[12:00]; batch 2: 11:10 (late, disjoint:
    // envelope gap) → open B=[11:10] buffered in STATE alongside A;
    // batch 3: 11:35 touches BOTH (11:35 ≤ 11:10+30 and ≥ 12:00−30) →
    // A and B must merge into one session [11:10, 12:30) n=3, exactly
    // session_window's answer (gaps 25 and 25 minutes, both ≤ 30).
    // Query started first so each addData is a genuine micro-batch and
    // the watermark advances between them.
    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.sessionCloseEvents(stream.toDF())
      .writeStream.format("memory").queryName("t_bridge")
      .outputMode(OutputMode.Append()).start()
    try {
      Seq(Streaming.EventRow(1L, ts(base), 1L, "a", 1.0),
        Streaming.EventRow(2L, ts(base - 50), 1L, "a", 2.0),
        Streaming.EventRow(3L, ts(base - 25), 1L, "a", 3.0),
        Streaming.EventRow(-1L, ts(base + 240), -1L, "flush", 0.0))
        .foreach { e => stream.addData(e); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_bridge")
      .filter(col("user_id") =!= -1L)
      .select("sess_start", "sess_end", "n_events")
      .collect().toSeq
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
    assert(got == Seq((ts(base - 50), ts(base + 30), 3L)), s"got $got")
  }

  test("event exactly on the gap horizon merges (session_window's inclusive boundary)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long): java.sql.Timestamp = new java.sql.Timestamp(min * 60000L)
    def ev(id: Long, uid: Long, min: Long) =
      Streaming.EventRow(id, ts(min), uid, "view", 1.0)
    // session_window semantics: events at minute 1 and minute 31 with a
    // 30-min gap form ONE session [1, 61) — the boundary is inclusive.
    // The custom emitter's merge test must agree. (The expiry-at-equality
    // in flush can never split such a pair: Spark's late filter drops
    // ts <= watermark before the operator, so once wm == horizon no
    // admissible event can land ON the horizon — locked here by keeping
    // the boundary event well above the watermark.)
    val stream = MemoryStream[Streaming.EventRow]
    stream.addData(ev(1, 1, 1), ev(2, 99, 60))   // wm for b2: max(1,60)-60 = 0
    stream.addData(ev(3, 1, 31))                 // exactly lastTs + gap → merge
    stream.addData(ev(4, 99, 9999))              // close everything
    Streaming.runToMemory(Streaming.sessionCloseEvents(stream.toDF()),
      "t_boundary", OutputMode.Append())
    val u1 = spark.table("t_boundary").filter(col("user_id") === 1)
      .select("sess_start", "sess_end", "n_events")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000,
        r.getTimestamp(1).getTime / 60000, r.getLong(2))).toSet
    assert(u1 == Set((1L, 61L, 2L)), s"got $u1")
    // batch twin agrees
    val batch = Seq(ev(1, 1, 1), ev(3, 1, 31)).toDF()
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n")).select("session_window.start", "session_window.end", "n")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000,
        r.getTimestamp(1).getTime / 60000, r.getLong(2))).toSet
    assert(batch == Set((1L, 61L, 2L)), s"batch twin got $batch")
  }

  test("late data beyond the watermark is dropped in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Streaming.EventRow]
    def ev(id: Long, minute: Int) = Streaming.EventRow(
      id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 1L, "view", 1.0)
    // batch 1: events up to 12:00 → watermark advances to 11:00 (1h lag)
    stream.addData(Seq(ev(1, 0), ev(2, 5)))
    val df = Streaming.tumbling(stream.toDF())
    val q = df.writeStream.format("memory").queryName("t_late")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      stream.addData(Seq(Streaming.EventRow(3,
        java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 1L, "view", 1.0)))
      q.processAllAvailable()
      // very late row, before the 12:00 watermark → dropped
      stream.addData(Seq(ev(4, 1)))
      q.processAllAvailable()
      stream.addData(Seq(Streaming.EventRow(5,
        java.sql.Timestamp.valueOf("2024-01-01 15:00:00"), 1L, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val counts = spark.table("t_late").agg(sum("n_events")).collect().head.getLong(0)
    // events 1,2 in the 10:00 window (closed when watermark passed); late
    // event 4 was NOT added to it
    val w10 = spark.table("t_late")
      .filter(col("win_start") === java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
      .agg(sum("n_events")).collect().head
    assert(w10.getLong(0) == 2, s"late row leaked into closed window")
  }
}
