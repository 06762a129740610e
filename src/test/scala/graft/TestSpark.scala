package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites run
  * sequentially in sbt's forked test JVM; a session per suite would pay
  * ~5s bootstrap each).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
