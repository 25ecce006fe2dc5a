package graft.llm

import org.apache.spark.sql.functions._

/** Stage attribution for the pair-LISTING minhash under a giant
  * duplicate group (the skew sweep's 148× row): times, separately,
  *
  *  (a) banded self-join candidate GENERATION (no distinct) — the
  *      Θ(bands·m²) row stream, scanned and counted but never exchanged;
  *  (b) generation + the cross-band DISTINCT — adds the full candidate
  *      exchange (the only shuffle whose volume is Θ(bands·m²));
  *  (c) the real [[Dedup.minhashLshPairs]] (generation + distinct +
  *      exact-Jaccard verify) with `dedup_minhash`'s own parameters.
  *
  * (b)−(a) ≈ what a map-side first-agreeing-band dedup could save;
  * (c)−(b) ≈ the verify's share, which is Θ(true pairs × set size) and
  * irreducible for a listing whose OUTPUT is those pairs. Run it before
  * optimizing the listing path — if the distinct share is small, the
  * query is output-bound by contract and the plan is already right.
  *
  * r18 measurement at the skew fixture's ~9.4k near-dup group
  * (SCALE.md "Pair-listing attribution"): (a) 183 s / 704M rows,
  * (b) 413 s / 51.3M pairs, (c) 567 s / 50.97M verified — generation
  * 32%, distinct 41%, verify 27%. The tempting fix — dedup IDENTICAL
  * buckets across bands before generating — was tried and MEASURED
  * WORSE (670 s vs ~450 s baseline on the same arm): a NEAR-dup group's
  * per-band buckets are pairwise-distinct member sets (each band drops
  * a different handful of members), so exact set identity collapses
  * nothing and the machinery is pure overhead. Cross-band redundancy is
  * only removable per-pair (first-agreeing-band), which caps the win at
  * the distinct's 41% while keeping the Θ(bands·m²) generation floor —
  * the row stays output-bound and the groups chain stays the scale path.
  *
  * Usage: SPARK_DRIVER_MEM=32g sbt "runMain graft.llm.PairListingProbe
  * /root/repo/.work/skew/skewed" (matches skew_sweep.sh's sizing).
  */
object PairListingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.work/skew/skewed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n, numHashes, bands, threshold) = (3, 32, 16, 0.5) // = dedup_minhash
    val r = numHashes / bands
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the same frames minhashLshPairsFromSets builds, so (a)/(b) time
    // exactly the stages the real query runs
    val withSets = docs
      .select(col("doc_id").as("id"), Dedup.shingles(col("text"), n).as("shset"))
      .filter(size(col("shset")) > 0)
      .localCheckpoint()
    val banded = withSets
      .select(col("id"),
        transform(col("shset"), s => abs(xxhash64(s))).as("hh"))
      .select(col("id"),
        Dedup.minhashSignatureFromHashes(col("hh"), numHashes).as("sig"))
      .select(col("id"), explode(Dedup.bandBuckets(col("sig"), bands, r)).as("bb"))
      .localCheckpoint()
    val flat = banded
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val joined = flat.alias("l")
      .join(flat.alias("r"), Seq("band", "bh"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val count = f
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%9.1f s  ($count rows)")
    }
    time("(a) candidate generation, no distinct") { joined.count() }
    time("(b) generation + cross-band distinct") { joined.distinct().count() }
    time("(c) full minhashLshPairs (gen + distinct + verify)") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", n, numHashes, bands, threshold)
        .count()
    }
  }
}
