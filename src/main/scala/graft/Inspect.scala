package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** O12 — metadata inspection, the Spark/Parquet analogue of the
  * reference's `scan` command (src/cli.cpp:120-170): prints schema, row
  * groups, per-column chunk offsets/sizes and per-chunk value counts with
  * min/max statistics, straight from the Parquet footer (no data read —
  * the same footer-only pass the reference does over its COLE metadata).
  */
object Inspect {

  def describe(path: String): String = {
    val sb = new StringBuilder
    val file = HadoopInputFile.fromPath(new Path(path), new Configuration())
    val reader = ParquetFileReader.open(file)
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
        }
      }
    } finally reader.close()
    sb.toString
  }

  /** `graft.Inspect <file.parquet>` — footer-only, no Spark session. */
  def main(args: Array[String]): Unit =
    args.foreach(p => println(describe(p)))
}
