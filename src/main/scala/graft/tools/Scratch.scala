package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val brute = graft.llm.Dedup
        .embeddingNearDupPairs(e, "vec_id", "embedding", 0.45)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((bits, tables) <- Seq((4, 16), (4, 32), (3, 32), (2, 16), (6, 48))) {
        val lsh = graft.llm.Dedup
          .embeddingNearDupPairs(e, "vec_id", "embedding", 0.45, lshBits = bits, lshTables = tables)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"$sf bits=$bits tables=$tables brute=${brute.size} lsh=${lsh.size} " +
          s"missed=${(brute -- lsh).size} extra=${(lsh -- brute).size}")
      }
    }
    spark.stop()
  }
}
