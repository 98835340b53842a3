package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a [[TypedImperativeAggregate]] —
  * the bounded-memory answer to "which tokens dominate the corpus" when
  * the exact vocabulary aggregate (q59) no longer fits: k counters per
  * partition, merged map-side, O(k) state regardless of input size. At
  * 100 TB an exact n-gram frequency table is its own shuffle problem;
  * the sketch turns it into one k-row partial per partition.
  *
  * Guarantees (the classic MG bounds, which survive merging — Agarwal et
  * al., "Mergeable Summaries", PODS'12):
  *   - estimates never exceed true counts (est ≤ true);
  *   - undercount is bounded: true − est ≤ N/(k+1) for N total items;
  *   - every item with true count > N/(k+1) is IN the sketch.
  * The spec asserts all three against exact counts; like q14's HLL the
  * output is not cross-engine oracle-able (estimates depend on partition
  * layout), so the registered query is rows-only checked and the
  * quantitative gate lives in the spec.
  *
  * Buffer: open HashMap of string→count. update() adds 1 and, on
  * overflow past k entries, subtracts the (k+1)-th largest count from
  * every entry and drops the ≤0 ones (for a single insert that is the
  * minimum — the textbook decrement step, batched). merge() sums
  * counters then applies the same shrink once — not per entry. */
object MisraGries {
  /** Column API: ARRAY<STRUCT<item STRING, est BIGINT>> sorted by
    * (est desc, item asc), at most k entries. */
  def sketch(item: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(ColumnBridge.expression(item), k)
      .toAggregateExpression())
}

/** Mutable MG state: item→count, ≤ k live entries after shrink. */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)

  def add(item: String, c: Long): Unit =
    counts.put(item, counts.getOrDefault(item, 0L) + c)

  /** Subtract the (k+1)-th largest count from all entries, drop ≤0 —
    * restores |counts| ≤ k while preserving the MG bounds.
    *
    * The per-row update path overflows by exactly ONE entry, where the
    * (k+1)-th largest IS the minimum — found in one allocation-free O(k)
    * pass (the textbook decrement step). The sort-based selection runs
    * only in merge(), which can overflow by up to k at once and executes
    * once per map-side partial, not per row. */
  def shrink(): Unit = {
    val size = counts.size
    if (size <= k) return
    val sub =
      if (size == k + 1) {
        var min = Long.MaxValue
        val it = counts.values.iterator
        while (it.hasNext) { val v = it.next(); if (v < min) min = v }
        min
      } else {
        val vs = new Array[Long](size)
        val it = counts.values.iterator
        var i = 0
        while (it.hasNext) { vs(i) = it.next(); i += 1 }
        java.util.Arrays.sort(vs)
        vs(vs.length - (k + 1)) // (k+1)-th largest
      }
    val eit = counts.entrySet.iterator
    while (eit.hasNext) {
      val e = eit.next()
      val nv = e.getValue - sub
      if (nv <= 0) eit.remove() else e.setValue(nv)
    }
  }
}

case class MisraGriesAgg(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(k > 0, s"misra-gries requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = itemExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) {
      // UTF8String may alias a reused scan buffer — materialize a JVM copy
      buf.add(v.asInstanceOf[UTF8String].toString, 1L)
      buf.shrink()
    }
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    val it = other.counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue)
    }
    buf.shrink()
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet.iterator
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  // Items are length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws
  // UTFDataFormatException past 65535 encoded bytes, and misra_gries is
  // registered as a general SQL aggregate over arbitrary STRING — a
  // whole-document key must survive the shuffle, not kill the job.
  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(itemExpr = newChildren(0))
}
