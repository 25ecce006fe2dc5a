package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", shufflePartitions = 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
