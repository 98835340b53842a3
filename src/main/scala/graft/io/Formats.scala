package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet: JSONL and CSV, configured so a
  * round-trip is LOSSLESS for arbitrary document text — the property
  * that actually bites in corpus work (embedded quotes, commas,
  * newlines, unicode).
  *
  * Deliberate choices, each load-bearing:
  *  - explicit schema on read, never inference: inference is an extra
  *    full pass over 100 TB AND makes the schema data-dependent (a batch
  *    with no nulls infers a different type than one with);
  *  - CSV writes with quoteAll + escaped quotes and `multiLine` read, so
  *    embedded newlines/commas/quotes survive;
  *  - JSONL is the default interchange for document corpora (one JSON
  *    object per line — splittable, appendable); Spark's json source
  *    escapes control characters, so embedded newlines survive without
  *    multiLine handling.
  * Both sources are splittable at scale (JSONL by line; CSV only when
  * multiLine=false — the spec documents that trade: lossless CSV with
  * embedded newlines costs per-file parallelism, which is why JSONL is
  * the recommended corpus format). */
object Formats {

  def writeJsonl(df: DataFrame, outDir: String): Unit =
    df.write.mode("errorifexists").json(outDir)

  def readJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  def writeCsv(df: DataFrame, outDir: String): Unit =
    df.write.mode("errorifexists")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .csv(outDir)

  /** ORC: the OTHER columnar interchange beside parquet — corpora arrive
    * in it from Hive-era warehouses. Spark's native orc source gives the
    * same scale machinery parquet gets: predicate pushdown + column
    * pruning reach the scan (FormatsSpec locks `PushedFilters` on the
    * plan), splittable stripes, zstd compression. Lossless for arbitrary
    * text (binary-safe strings, no quoting layer to get wrong). */
  def writeOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode("errorifexists").option("compression", "zstd").orc(outDir)

  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  /** emptyValue "" is load-bearing: without it Spark's CSV reader maps a
    * quoted empty field to NULL (its default nullValue is the empty
    * string), so `""` does not round-trip. With it, empty strings
    * survive; a true NULL also comes back as "" — CSV fundamentally
    * conflates the two without a sentinel value that could collide with
    * real text (spec documents the trade; JSONL has no such ambiguity,
    * one more reason it is the recommended corpus format). */
  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("emptyValue", "")
      // default nullValue is "" — it reclassifies the quoted empty field
      // back to NULL even with emptyValue set; point it at a sentinel no
      // real text contains (U+0000) so "" survives the round trip
      .option("nullValue", "\u0000")
      .csv(dir)
}
