package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{PageHeader, PageType, Util}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** O12 — metadata inspection, the Spark/Parquet analogue of the
  * reference's `scan` command (src/cli.cpp:120-170): prints schema, row
  * groups, per-column chunk offsets/sizes and per-chunk value counts with
  * min/max statistics from the Parquet footer, then walks each chunk's
  * page headers to print PER-PAGE value counts and min/max — the same
  * page granularity the reference prints (src/cli.cpp:151-166, its
  * PageStats are per page by construction). The page walk reads only the
  * thrift page headers (seek + header decode, data bytes are skipped),
  * so cost stays proportional to page count, not data volume.
  */
object Inspect {

  /** Decode a page-statistics value by physical type for display. An
    * all-null page stores EMPTY min/max byte arrays in the ColumnIndex
    * (null_pages[i]=true), so emptiness is as normal as absence.
    */
  private def statValue(bytes: Array[Byte], t: PrimitiveTypeName): String =
    if (bytes == null || bytes.isEmpty) "?"
    else try t match {
      case PrimitiveTypeName.INT32 =>
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt.toString
      case PrimitiveTypeName.INT64 =>
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toString
      case PrimitiveTypeName.FLOAT =>
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat.toString
      case PrimitiveTypeName.DOUBLE =>
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getDouble.toString
      case PrimitiveTypeName.BINARY =>
        new String(bytes, StandardCharsets.UTF_8)
      case _ => bytes.map("%02x".format(_)).mkString
    } catch { // truncated stats in a malformed file: show raw, don't abort
      case _: java.nio.BufferUnderflowException =>
        bytes.map("%02x".format(_)).mkString
    }

  /** One display line per page of a column chunk:
    * `page <i>: <type> values=<n> [min=.. max=.. nulls=..]`.
    *
    * Structure (page kind, value count) comes from the inline page
    * headers; per-page min/max/null stats come from the footer-side
    * ColumnIndex when present (modern parquet writers put page stats
    * there — inline page-header statistics are deprecated), falling back
    * to page-header statistics for files old enough to carry them.
    */
  private def pageLines(
      in: org.apache.parquet.io.SeekableInputStream,
      startPos: Long, totalSize: Long, t: PrimitiveTypeName,
      colIndex: Option[org.apache.parquet.internal.column.columnindex.ColumnIndex])
      : Seq[String] = {
    def bytes(bb: java.nio.ByteBuffer): Array[Byte] = {
      val d = bb.duplicate(); val a = new Array[Byte](d.remaining()); d.get(a); a
    }
    in.seek(startPos)
    val lines = Seq.newBuilder[String]
    var i = 0
    var dataPage = 0 // ordinal into the ColumnIndex (data pages only)
    while (in.getPos - startPos < totalSize) {
      val ph: PageHeader = Util.readPageHeader(in)
      val (kind, nValues, headerStats) = ph.getType match {
        case PageType.DICTIONARY_PAGE =>
          ("dict", ph.getDictionary_page_header.getNum_values, None)
        case PageType.DATA_PAGE =>
          val h = ph.getData_page_header
          ("data", h.getNum_values, Option(h.getStatistics))
        case PageType.DATA_PAGE_V2 =>
          val h = ph.getData_page_header_v2
          ("data_v2", h.getNum_values, Option(h.getStatistics))
        case other => (other.toString.toLowerCase, -1, None)
      }
      val isData = kind.startsWith("data")
      val statsStr = colIndex match {
        case Some(ci) if isData && dataPage < ci.getMinValues.size() =>
          val mn = statValue(bytes(ci.getMinValues.get(dataPage)), t)
          val mx = statValue(bytes(ci.getMaxValues.get(dataPage)), t)
          val nulls = Option(ci.getNullCounts).map(_.get(dataPage)).getOrElse(0L)
          s" min=$mn max=$mx nulls=$nulls"
        case _ => headerStats.map { s =>
          val mn = statValue(if (s.isSetMin_value) s.getMin_value else s.getMin, t)
          val mx = statValue(if (s.isSetMax_value) s.getMax_value else s.getMax, t)
          s" min=$mn max=$mx nulls=${if (s.isSetNull_count) s.getNull_count else 0L}"
        }.getOrElse("")
      }
      lines += s"      page $i: $kind values=$nValues$statsStr"
      if (isData) dataPage += 1
      in.seek(in.getPos + ph.getCompressed_page_size)
      i += 1
    }
    lines.result()
  }

  def describe(path: String): String = {
    val sb = new StringBuilder
    val file = HadoopInputFile.fromPath(new Path(path), new Configuration())
    val reader = ParquetFileReader.open(file)
    val in = file.newStream()
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      sb.append(s"file: $path\n")
      sb.append(s"schema:\n${schema}")
      val rgs = footer.getBlocks.asScala
      sb.append(s"row groups: ${rgs.size}, total rows: ${rgs.map(_.getRowCount).sum}\n")
      rgs.zipWithIndex.foreach { case (rg, i) =>
        sb.append(f"  row group $i%d: rows=${rg.getRowCount}%d bytes=${rg.getTotalByteSize}%d\n")
        rg.getColumns.asScala.foreach { c =>
          val stats = Option(c.getStatistics)
          val statsStr = stats.map(s =>
            s"min=${s.minAsString} max=${s.maxAsString} nulls=${s.getNumNulls}")
            .getOrElse("no stats")
          sb.append(s"    ${c.getPath} ${c.getPrimitiveType.getPrimitiveTypeName}" +
            s" enc=${c.getEncodings.asScala.mkString("+")}" +
            s" offset=${c.getStartingPos} compressed=${c.getTotalSize}" +
            s" uncompressed=${c.getTotalUncompressedSize} values=${c.getValueCount} $statsStr\n")
          val colIndex =
            try Option(reader.readColumnIndex(c)) catch { case _: Exception => None }
          pageLines(in, c.getStartingPos, c.getTotalSize,
            c.getPrimitiveType.getPrimitiveTypeName, colIndex)
            .foreach(l => sb.append(l).append('\n'))
        }
      }
    } finally { in.close(); reader.close() }
    sb.toString
  }

  /** `graft.Inspect <file.parquet>` — footer + page headers only, no
    * Spark session, no data decode.
    */
  def main(args: Array[String]): Unit =
    args.foreach(p => println(describe(p)))
}
