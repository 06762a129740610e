package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame

/** O3 writer-side control — the Spark/Parquet analogue of the reference
  * writer's user-chosen per-column encodings and explicit row-group
  * flushing (`/root/reference/columnar-analytics-engine/include/format.h:52`
  * per-column EncodingType in the schema; `src/format.cpp:271-284` the
  * PLAIN/RLE/DELTA switch; `src/format.cpp:380-420` row-group flush).
  *
  * Parquet-mr makes the same choices configuration-driven rather than
  * call-driven, which is the right shape for a distributed writer (every
  * task must agree on layout without coordination):
  *   - row-group flushing        -> `parquet.block.size` (bytes per group)
  *   - DELTA encodings           -> `parquet.writer.version=v2`
  *     (DELTA_BINARY_PACKED for ints, DELTA_BYTE_ARRAY as the binary
  *     fallback — the reference's DeltaEncoder, src/encoding.cpp)
  *   - RLE/dictionary            -> `parquet.enable.dictionary[#column]`
  *     (per-column override, the reference's per-column EncodingType)
  *   - page granularity          -> `parquet.page.size`
  *
  * [[describe]] closes the loop: it reads the written footers back and
  * reports per-row-group, per-column encodings, so a caller (and the
  * spec/catalog gates) can assert the requested layout actually landed on
  * disk instead of trusting the writer.
  */
object ParquetWrite {

  /** Declarative writer layout. Defaults match parquet-mr's. */
  final case class WriteSpec(
      rowGroupBytes: Long = 128L << 20,
      pageBytes: Int = 1 << 20,
      /** "v1" (PLAIN/dictionary) or "v2" (DELTA family). */
      writerVersion: String = "v1",
      dictionaryDefault: Boolean = true,
      /** Per-column dictionary override by column name. */
      dictionaryOverrides: Map[String, Boolean] = Map.empty,
      compression: String = "snappy",
      /** Cluster rows within each output file for tight column stats. */
      sortWithinPartitions: Seq[String] = Nil,
      /** 0 = unlimited; >0 caps rows per output file. */
      maxRecordsPerFile: Long = 0L,
      /** Hive-style partition columns (`col=value/` directories): the
        * layout that lets a filtered scan prune whole directories at
        * file-listing time — before any footer is read.
        */
      partitionBy: Seq[String] = Nil)

  /** Serializes [[write]] calls within one JVM. Root cause (bisected
    * and confirmed against the parquet-column 1.16 bytecode this
    * round): `ParquetProperties.Builder` defaults every writer to the
    * JVM-SHARED mutable `ParquetProperties.DEFAULT_VALUES_WRITER_FACTORY`,
    * and constructing any new ParquetProperties calls
    * `initialize(this)` on that singleton, re-pointing its delegate
    * (v1 vs v2 factory AND the captured properties that decide
    * per-column dictionary use). An open writer builds its values
    * writers PER ROW GROUP through the singleton, so a concurrent
    * parquet write — even a plain one with no options — can flip this
    * writer's encodings at its next row-group boundary (observed: a
    * v2/dict-off file whose later row groups landed v1 PLAIN_DICTIONARY;
    * values stay lossless, only the physical layout drifts). This lock
    * removes the engine's own layout-write vs layout-write races; a
    * racing PLAIN write from another thread can still flip encodings,
    * which is why the encoding/layout-gated catalog queries (q87, q88)
    * run exclusively in Verify's drained tail.
    *
    * TODO(scale): the lock wraps the whole Spark write action, so it is
    * a JVM-wide serialization point any future layout-write path
    * inherits silently. The real fix is upstream (PARQUET: give each
    * writer its own ValuesWriterFactory instead of re-initializing the
    * shared singleton); until then, if layout-controlled call sites
    * grow beyond the current three, narrow the critical section (e.g.
    * pre-build the writer factory under the lock, run the job outside).
    */
  private val writeLock = new Object

  def write(df: DataFrame, path: String, spec: WriteSpec = WriteSpec(),
      mode: String = "overwrite"): Unit = writeLock.synchronized {
    require(spec.writerVersion == "v1" || spec.writerVersion == "v2",
      s"writerVersion must be v1 or v2, got ${spec.writerVersion}")
    val clustered =
      if (spec.sortWithinPartitions.isEmpty) df
      else df.sortWithinPartitions(
        spec.sortWithinPartitions.map(org.apache.spark.sql.functions.col): _*)
    var w = clustered.write.mode(mode)
      .option("parquet.block.size", spec.rowGroupBytes.toString)
      .option("parquet.page.size", spec.pageBytes.toString)
      .option("parquet.writer.version", spec.writerVersion)
      .option("parquet.enable.dictionary", spec.dictionaryDefault.toString)
      .option("compression", spec.compression)
    spec.dictionaryOverrides.foreach { case (c, on) =>
      w = w.option(s"parquet.enable.dictionary#$c", on.toString)
    }
    if (spec.maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", spec.maxRecordsPerFile.toString)
    if (spec.partitionBy.nonEmpty)
      w = w.partitionBy(spec.partitionBy: _*)
    w.parquet(path)
  }

  /** Footer-derived physical layout of one column chunk. `encodings` are
    * parquet encoding names (e.g. DELTA_BINARY_PACKED, RLE_DICTIONARY);
    * `hasDict` is whether the chunk wrote a dictionary page.
    */
  final case class ChunkLayout(
      file: String, rowGroup: Int, column: String, rows: Long,
      encodings: Set[String], hasDict: Boolean)

  /** Per-row-group numeric min/max of the requested columns across every
    * parquet part file under `dir` — the footer statistics a stats-pruned
    * scan consults. Footer reads only; lets a caller PROVE how many row
    * groups a range predicate can skip (the reference's stats-based page
    * skipping, src/execution.cpp:48-71, observed from the outside).
    */
  final case class ChunkStats(
      file: String, rowGroup: Int, column: String, rows: Long,
      min: Double, max: Double)

  def rowGroupStats(dir: String, cols: Set[String]): Seq[ChunkStats] = {
    def num(v: Any): Double = v match {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"non-numeric stats value: $other")
    }
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    files.flatMap { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
      try reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
        case (rg, i) => rg.getColumns.asScala.toSeq
          .filter(c => cols.contains(c.getPath.toDotString))
          .map { c =>
            val s = c.getStatistics
            require(s != null && s.hasNonNullValue,
              s"missing footer stats for ${c.getPath.toDotString}")
            ChunkStats(st.getPath.getName, i, c.getPath.toDotString,
              rg.getRowCount, num(s.genericGetMin), num(s.genericGetMax))
          }
      } finally reader.close()
    }
  }

  /** Per-row-group, per-column encodings of every parquet part file under
    * `dir` — footer reads only, no data pages touched.
    */
  def describe(dir: String): Seq[ChunkLayout] = {
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    files.flatMap { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
      try reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
        case (rg, i) => rg.getColumns.asScala.toSeq.map { c =>
          ChunkLayout(st.getPath.getName, i,
            c.getPath.toDotString, rg.getRowCount,
            c.getEncodings.asScala.map(_.name()).toSet,
            c.hasDictionaryPage)
        }
      } finally reader.close()
    }
  }
}
