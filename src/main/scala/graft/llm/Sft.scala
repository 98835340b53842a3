package graft.llm

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Instruction-tuning (SFT) data preparation: chat-template rendering
  * with LOSS-MASK spans, and the exact inverse parse — the step between
  * a curated corpus and a fine-tuning run. Every serious SFT pipeline
  * needs (a) a deterministic template, (b) the character spans the loss
  * is computed over (assistant content only — training on user/system
  * text teaches the model to imitate prompts), and (c) an auditable
  * round-trip so rendered shards can be re-validated without the
  * original conversation store.
  *
  * Template (documented contract, role markers on their own lines):
  * {{{
  * <|role|>
  * content
  * <|role|>
  * content
  * <|end|>
  * }}}
  * Content is raw (no escaping) — the contract REQUIRES conversation
  * content free of the `<|` marker prefix; [[render]] rejects violators
  * (quarantine), which keeps [[parse]] an exact inverse.
  */
object Sft {

  final case class Turn(role: String, content: String)

  /** Character span [start, end) of one assistant content segment in
    * the rendered string — the loss-mask unit. */
  final case class MaskSpan(start: Int, end: Int)

  final case class Rendered(text: String, spans: Seq[MaskSpan])

  private val Roles = Set("system", "user", "assistant")
  private val End = "<|end|>"

  /** Render turns; None (quarantine) when a role is unknown or content
    * embeds the marker prefix (would make the template ambiguous). */
  def render(turns: Seq[Turn]): Option[Rendered] = {
    if (turns.isEmpty) return None
    if (turns.exists(t => !Roles.contains(t.role) || t.content == null ||
        t.content.contains("<|"))) return None
    val sb = new StringBuilder
    val spans = Seq.newBuilder[MaskSpan]
    for (t <- turns) {
      sb ++= s"<|${t.role}|>\n"
      val start = sb.length
      sb ++= t.content
      if (t.role == "assistant") spans += MaskSpan(start, sb.length)
      sb += '\n'
    }
    sb ++= End
    Some(Rendered(sb.toString, spans.result()))
  }

  /** Exact inverse of [[render]] on its image; None on anything not
    * produced by it (truncated shard, corrupted marker, missing end). */
  def parse(rendered: String): Option[Seq[Turn]] = {
    if (rendered == null || !rendered.endsWith(End)) return None
    val body = rendered.dropRight(End.length)
    val out = Vector.newBuilder[Turn]
    var pos = 0
    var n = 0
    while (pos < body.length) {
      if (!body.startsWith("<|", pos)) return None
      val close = body.indexOf("|>\n", pos + 2)
      if (close < 0) return None
      val role = body.substring(pos + 2, close)
      if (!Roles.contains(role)) return None
      val contentStart = close + 3
      // content runs to the newline before the next marker (or body end)
      val next = body.indexOf("\n<|", contentStart)
      val contentEnd = if (next < 0) body.length - 1 else next
      if (contentEnd < contentStart) return None
      out += Turn(role, body.substring(contentStart, contentEnd))
      pos = contentEnd + 1
      n += 1
    }
    val turns = out.result()
    if (n == 0) None else Some(turns)
  }

  /** Total masked (loss-bearing) characters — derived from the SPANS,
    * so a span-offset defect shows up as a wrong count even when the
    * rendered text is right. */
  def maskChars(r: Rendered): Int = r.spans.map(s => s.end - s.start).sum

  /** Every span must slice the rendered text to exactly an assistant
    * turn's content, in order — the audit a training loader runs. */
  def spansConsistent(r: Rendered, turns: Seq[Turn]): Boolean = {
    val asst = turns.filter(_.role == "assistant").map(_.content)
    r.spans.size == asst.size &&
      r.spans.zip(asst).forall { case (s, c) =>
        s.start >= 0 && s.end <= r.text.length &&
          r.text.substring(s.start, s.end) == c
      }
  }

  // ------------------------------------------------------ q214 gate

  private val SystemPrompt = "You are a concise assistant."

  /** The q214 kernel: build the two-exchange conversation, render,
    * AUDIT (parse-back equals the turns, spans slice to assistant
    * content), and summarize. ok=false on any audit failure — the
    * oracle expects every row ok, so a render/parse/span defect breaks
    * the gate, not just a spec. */
  private val renderAudit = udf { (q1: String, q2: String, q3: String, q4: String) =>
    val turns = Seq(Turn("system", SystemPrompt), Turn("user", q1),
      Turn("assistant", q2), Turn("user", q3), Turn("assistant", q4))
    render(turns).map { r =>
      val ok = spansConsistent(r, turns) && parse(r.text).contains(turns)
      (r.text, maskChars(r), ok)
    }.orNull
  }

  /** q214: SFT shard preparation through the oracle gate — every
    * document becomes a two-exchange conversation (char-quarter splits,
    * exact in both engines on the all-ASCII corpus), renders through
    * the chat template, and the census binds conversation counts,
    * rendered volume, LOSS-MASK volume (derived from the spans, so a
    * span-offset bug moves it), the round-trip audit, and a mod-prime
    * md5 fingerprint sum of the rendered shards. Ground truth by
    * construction: the oracle concatenates the template directly.
    * Scale shape: pure per-row kernel + one census aggregate — the
    * embarrassingly-parallel shard-prep shape; rendered text never
    * shuffles (only its length/hash do). */
  def sftRender(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val len = length(col("text"))
    val a = expr("length(text) div 4")
    val b = expr("length(text) div 2")
    val c = expr("(3 * length(text)) div 4")
    val r = renderAudit(
      substr(col("text"), lit(1), a),
      substr(col("text"), a + 1, b - a),
      substr(col("text"), b + 1, c - b),
      substr(col("text"), c + 1, len - c)).as("r")
    docs.select(col("source"), r)
      .select(col("source"), col("r._1").as("rendered"),
        col("r._2").as("mask_chars"), col("r._3").as("ok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_convs"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(length(col("rendered"))).cast("long").as("sum_chars"),
        sum(col("mask_chars")).cast("long").as("sum_mask"),
        pmod(sum(pmod(conv(substring(md5(col("rendered")), 1, 15), 16, 10)
          .cast("long"), lit(1000000007L))), lit(1000000007L)).as("fp_sum"))
      .orderBy(col("source"))
  }

  val sftRenderSql: String =
    """WITH r AS (
      |  SELECT source,
      |    '<|system|>' || chr(10) || 'You are a concise assistant.' || chr(10)
      |    || '<|user|>' || chr(10) || substr(text, 1, strlen(text) // 4) || chr(10)
      |    || '<|assistant|>' || chr(10)
      |    || substr(text, strlen(text) // 4 + 1, strlen(text) // 2 - strlen(text) // 4) || chr(10)
      |    || '<|user|>' || chr(10)
      |    || substr(text, strlen(text) // 2 + 1, (3 * strlen(text)) // 4 - strlen(text) // 2) || chr(10)
      |    || '<|assistant|>' || chr(10)
      |    || substr(text, (3 * strlen(text)) // 4 + 1, strlen(text) - (3 * strlen(text)) // 4) || chr(10)
      |    || '<|end|>' AS rendered,
      |    (strlen(text) // 2 - strlen(text) // 4)
      |      + (strlen(text) - (3 * strlen(text)) // 4) AS mask_chars
      |  FROM documents
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_convs,
      |  CAST(COUNT(*) AS BIGINT) AS n_ok,
      |  CAST(SUM(strlen(rendered)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(mask_chars) AS BIGINT) AS sum_mask,
      |  CAST(SUM(CAST(concat('0x', substr(md5(rendered), 1, 15)) AS BIGINT)
      |    % 1000000007) % 1000000007 AS BIGINT) AS fp_sum
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q214_sft_render", sftRender, Some(sftRenderSql)))
}
