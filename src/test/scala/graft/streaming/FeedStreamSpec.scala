package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming feed-poll door: RSS and Atom payloads parse on the
  * stream, item links join the frontier gate (spelling-dedup +
  * landed-anti-join), junk feeds vanish, and no join state exists. */
class FeedStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  private def rss(links: String*): String =
    "<rss version=\"2.0\"><channel>" + links.map(l =>
      s"<item><title>t</title><link>$l</link></item>").mkString +
      "</channel></rss>"

  private def atom(links: String*): String =
    "<feed>" + links.map(l =>
      s"""<entry><title>t</title><link rel="alternate" href="$l"/></entry>""")
      .mkString + "</feed>"

  test("feed door: both kinds parse, links dedup through the frontier gate") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val landed = Seq("https://x.com/landed").toDF("url")
    val stream = MemoryStream[Streaming.FeedIngestRow]
    val q = Streaming.feedIngestStream(stream.toDF(), landed)
      .writeStream.format("memory").queryName("feed_stream")
      .outputMode("append").start()
    try {
      stream.addData(
        Streaming.FeedIngestRow(rss("https://x.com/a", "https://x.com/b"), ts(0)),
        // atom re-spelling of /a: loses to the first arrival
        Streaming.FeedIngestRow(atom("HTTPS://X.com:443/a#frag"), ts(1000)),
        // already-landed canonical: dropped
        Streaming.FeedIngestRow(rss("https://x.com/landed?utm_source=f"), ts(2000)),
        // junk feed: zero links, vanishes
        Streaming.FeedIngestRow("<html>not a feed</html>", ts(3000)))
      q.processAllAvailable()
      // dedup must hold ACROSS micro-batches and across feed kinds
      stream.addData(
        Streaming.FeedIngestRow(atom("https://x.com/b?utm_campaign=z",
          "https://y.co.uk/new"), ts(4000)))
      q.processAllAvailable()
      val ops = q.recentProgress.flatMap(_.stateOperators)
        .map(_.operatorName).distinct.toSeq
      assert(ops.nonEmpty && ops.forall(o => !o.toLowerCase.contains("join")),
        s"feed door must hold no join state, found: $ops")
    } finally q.stop()

    val got = spark.table("feed_stream").collect()
      .map(_.getString(2)).toSet
    assert(got == Set("https://x.com/a", "https://x.com/b", "https://y.co.uk/new"))
  }
}
