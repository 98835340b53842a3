package graft.text

import graft.io.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** File-level twins of the reference's text entry points — the exact
  * folder-in/file-out workflows a user of the reference runs, built on
  * the table-level operators (which the oracle checks at scale):
  *
  *  - [[mergeTextFolder]]  ← `merge_text_files` (`other_tasks.py:6-26`)
  *  - [[removeDuplicatesFile]] ← `remove_duplicates` (`other_tasks.py:100-125`)
  *  - [[splitTextFile]]    ← `split_jsonl` (`other_tasks.py:69-98`)
  *
  * Outputs are byte-exact vs the reference (spec-verified against an
  * inline reimplementation of the Python loops) with one documented
  * deviation: the reference iterates `os.listdir` (OS-dependent order);
  * we merge in SORTED filename order so results are deterministic
  * everywhere. Inputs are assumed newline-terminated (POSIX text files) —
  * the reference's own outputs always are.
  *
  * Scale shape: all three run as distributed plans until the final
  * single-file materialization, which is inherent to the reference's
  * one-file output contract (`writeFilePerRow` writes from executors;
  * per-file payloads are bounded by the merge guard's reasoning —
  * see TextOps.requireBoundedGroups).
  */
object FileWorkflows {

  /** `input_file_name()` is a percent-ENCODED URI — sorting it directly
    * would order `a b.txt` after `a!b.txt` (%20 > !). Decode to the real
    * filename first. java.net.URI decoding (not URLDecoder, which eats
    * `+` as space). */
  private val decodedName = udf { (uri: String) =>
    val path = try new java.net.URI(uri).getPath catch { case _: Exception => uri }
    path.substring(path.lastIndexOf('/') + 1)
  }

  /** Concatenate every `*.txt` under `inDir` (sorted filename order) with
    * a blank-line separator into `outDir/merged_output.txt`.
    *
    * The glob's character classes match any case of the extension
    * (`a.TXT`, `a.Txt`, …), mirroring the reference's
    * `fname.lower().endswith(".txt")` (`other_tasks.py:16`).
    *
    * The whole folder becomes ONE output row, so the merge guard runs
    * first: a folder whose total payload exceeds `maxBytes` fails fast
    * with the folder named instead of OOM-ing the executor that would
    * have collected it (same policy as TextOps.mergePerSource). */
  def mergeTextFolder(spark: SparkSession, inDir: String, outDir: String,
                      maxBytes: Long = 256L << 20): String = {
    Sinks.requireEmptyDir(outDir)
    val glob = s"$inDir/*.[tT][xX][tT]"
    // Size guard from file METADATA (globStatus), not a data pass: a
    // wholetext row's octet_length equals the file's byte length, so
    // summing FileStatus lengths is the same bound at listing cost —
    // the payload is read exactly once (by the merge itself). A
    // DIRECTORY matching the glob is expanded one level (that is what
    // spark.read.text does with a directory input), so its contents
    // count toward the bound rather than its ~0-byte metadata length.
    // Like any listing-based bound, files appended between this check
    // and the merge read escape it — same TOCTOU window the reference's
    // sequential loop has.
    val globPath = new org.apache.hadoop.fs.Path(glob)
    val fs = globPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(globPath)).getOrElse(Array.empty)
    // Names HIDDEN to Spark's file reader are skipped even when the glob
    // matches them directly — the guard must skip them at BOTH levels or
    // a large _backup.txt would abort a merge whose actual read payload
    // is tiny. The rule that decides what the reader treats as DATA is
    // PartitioningAwareFileIndex.isDataPath (verified against the Spark
    // 4.1 bytecode, and empirically in the spec): hidden iff
    // (`_`-prefixed AND not containing '=') OR `.`-prefixed. Note this is
    // NOT HadoopFSUtils.shouldFilterOutPathName — that listing-time rule
    // exempts `_metadata*`, but such files are still excluded as DATA, so
    // they must not count toward the bound (a spec plants one and proves
    // the reader skips it); `_`-names containing '=' ARE data and count.
    def hidden(p: org.apache.hadoop.fs.Path): Boolean = {
      val n = p.getName
      (n.startsWith("_") && !n.contains("=")) || n.startsWith(".")
    }
    val totalBytes = statuses.filterNot(st => hidden(st.getPath)).flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(_.isFile).filterNot(f => hidden(f.getPath))
      else Array(st)
    }.map(_.getLen + 2L).sum
    if (totalBytes > maxBytes)
      throw new IllegalStateException(
        s"merge groups exceed $maxBytes bytes: $inDir=${totalBytes}B — " +
          "split the source or raise the bound")
    val joined = spark.read.option("wholetext", "true").text(glob)
      .select(decodedName(input_file_name()).as("file"), col("value"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("file"), col("value")))),
          x => x.getField("value")),
        "\n\n").as("merged"))
      .select(lit("merged_output.txt").as("file_name"),
        encode(col("merged"), "UTF-8").as("data"))
    Sinks.writeFilePerRow(joined, outDir)
    s"$outDir/merged_output.txt"
  }

  /** First-occurrence line dedup of one text file into
    * `outDir/{name}_purged{ext}` — the reference's `seen`-set loop as a
    * hash aggregate + order restore. */
  def removeDuplicatesFile(spark: SparkSession, inFile: String, outDir: String): String = {
    Sinks.requireEmptyDir(outDir)
    val base = new java.io.File(inFile).getName
    val dot = base.lastIndexOf('.')
    val outName =
      if (dot >= 0) base.substring(0, dot) + "_purged" + base.substring(dot)
      else base + "_purged"
    val lines = TextOps.linesWithIds(spark, inFile)
    val purged = lines
      .groupBy(col("value")).agg(min(col("line_id")).as("line_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("line_id"), col("value")))),
          x => x.getField("value")),
        "\n").as("joined"))
      .select(lit(outName).as("file_name"),
        encode(concat(col("joined"), lit("\n")), "UTF-8").as("data"))
    Sinks.writeFilePerRow(purged, outDir)
    s"$outDir/$outName"
  }

  /** Split one text file into `outDir/split_{k}.txt` chunks: the
    * reference counts +2 per record (record + blank line) and rolls the
    * file at `linesPerFile`, i.e. ceil(linesPerFile/2) records per chunk;
    * every record is written as `line + "\n\n"`. Distributed row
    * numbering via Dist.globalRowNumber — no single-partition sort.
    *
    * Exact-fill quirk, matched byte-for-byte: when the last record
    * exactly fills a chunk (or the input is empty), the reference's
    * rollover has already opened the NEXT file, so an empty
    * `split_{k+1}.txt` exists on disk and is counted in the result
    * (`other_tasks.py:88-95`: the counter resets, `file_count` is
    * incremented and the file is opened before the loop ends). */
  def splitTextFile(spark: SparkSession, inFile: String, outDir: String,
                    linesPerFile: Int): Long = {
    Sinks.requireEmptyDir(outDir)
    val perChunk = math.max(1, math.ceil(linesPerFile / 2.0).toInt)
    val lines = TextOps.linesWithIds(spark, inFile)
    // chunk count from one cheap line count — NOT chunks.count(), which
    // would re-execute the whole numbering/grouping pipeline post-write
    val nLines = lines.count()
    val fileCount =
      if (nLines % perChunk == 0) nLines / perChunk + 1 // incl. empty input
      else (nLines + perChunk - 1) / perChunk
    val numbered = graft.Dist.globalRowNumber(lines, col("line_id"))
    val chunks = numbered
      .withColumn("chunk", expr(s"(rn - 1) div $perChunk"))
      .groupBy(col("chunk"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("value")))),
          x => concat(x.getField("value"), lit("\n\n"))),
        "").as("body"))
      .select(format_string("split_%d.txt", col("chunk") + 1).as("file_name"),
        encode(col("body"), "UTF-8").as("data"))
    val withTrailing =
      if (nLines % perChunk == 0)
        chunks.union(spark.range(1).select(
          lit(s"split_$fileCount.txt").as("file_name"),
          lit(Array.empty[Byte]).as("data")))
      else chunks
    Sinks.writeFilePerRow(withTrailing, outDir)
    fileCount
  }
}
