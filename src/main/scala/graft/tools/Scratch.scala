package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def t(name: String) = spark.read.parquet(s"$sf/$name.parquet")

    def q5variant(shape: String) = {
      val r = t("region").filter(col("r_name") === "ASIA")
      val n = t("nation")
      val c = t("customer")
      val o = t("orders")
      val li = t("lineitem")
      val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000, 0)
        .cast(LongType)
      val oAsia = o
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("o_orderkey"), col("n_name"))
      shape match {
        case "orig" =>
          li.join(o, li("l_orderkey") === o("o_orderkey"))
            .join(broadcast(c), o("o_custkey") === c("c_custkey"))
            .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
            .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
            .groupBy(col("n_name")).agg(sum(rev).as("revenue_c4"))
            .orderBy(col("revenue_c4").desc, col("n_name"))
        case "preagg" =>
          val liAgg = li.groupBy(col("l_orderkey")).agg(sum(rev).as("rev_c4"))
          liAgg.join(oAsia, liAgg("l_orderkey") === oAsia("o_orderkey"))
            .groupBy(col("n_name")).agg(sum(col("rev_c4")).as("revenue_c4"))
            .orderBy(col("revenue_c4").desc, col("n_name"))
        case "filterfirst" =>
          li.join(oAsia, li("l_orderkey") === oAsia("o_orderkey"))
            .groupBy(col("n_name")).agg(sum(rev).as("revenue_c4"))
            .orderBy(col("revenue_c4").desc, col("n_name"))
      }
    }

    val shapes = Seq("orig", "preagg", "filterfirst")
    shapes.foreach(s => q5variant(s).count()) // warmup
    shapes.foreach { s =>
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        q5variant(s).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"q5[$s]: ${times.map(x => f"$x%.2f").mkString(" ")} min=${times.min}%.2f")
    }
    println("--- filterfirst plan ---")
    q5variant("filterfirst").explain("formatted")
  }
}
