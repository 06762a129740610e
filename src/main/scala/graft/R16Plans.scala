package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Scratch (round-16, not shipped): dump `.explain("formatted")` of named
  * catalog queries' returned frames to plans/r16/<name>_<suffix>.txt.
  * Usage: runMain graft.R16Plans <suffix> <name>[,<name>...]
  */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("r16-plans")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("/root/repo/plans/r16"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(
        Paths.get(s"/root/repo/plans/r16/${name}_$suffix.txt"), txt)
      System.err.println(s"[r16-plans] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
