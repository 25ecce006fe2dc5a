package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // recall check at oracle scales
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val brute = graft.llm.Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.45)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((bits, tables) <- Seq((5, 24), (5, 32), (6, 32))) {
        val lsh = graft.llm.Dedup
          .embeddingNearDupPairs(e, "vec_id", "embedding", 0.45, lshBits = bits, lshTables = tables)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"$sf bits=$bits tables=$tables brute=${brute.size} " +
          s"missed=${(brute -- lsh).size} extra=${(lsh -- brute).size}")
      }
    }
    // timing at bench scale
    val e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for ((bits, tables) <- Seq((5, 24), (5, 32), (6, 32)); round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.llm.Dedup
        .embeddingNearDupPairs(e1, "vec_id", "embedding", 0.45, lshBits = bits, lshTables = tables)
        .count()
      println(f"sf0.1 bits=$bits tables=$tables r$round pairs=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
