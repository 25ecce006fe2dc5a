package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSuite extends AnyFunSuite {

  test("custom expressions are callable from SQL once registered") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT iceberg_bucket(16, CAST(34 AS BIGINT)) AS b,
        |       rolling_hash('ab') AS rh,
        |       simhash64('hello world') AS sh,
        |       array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       size(word_shingles('a b c d', 3)) AS ws""".stripMargin).head()
    assert(r.getInt(0) === graft.functions.IcebergHashing.bucketLong(34L, 16))
    assert(r.getLong(1) === 97L * 257 + 98)
    assert(r.getDouble(3) === 11.0)
    assert(r.getInt(4) === 2)
  }

  test("curation expressions are callable from SQL once registered") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT normalize_text('  A  B ') AS nt,
        |       size(minhash_signature(array(CAST(7 AS BIGINT)), 8)) AS mh,
        |       size(hyperplane_signatures(array(1.0d, 0.5d), 5, 3, 2)) AS hp""".stripMargin).head()
    assert(r.getString(0) === "a b")
    assert(r.getInt(1) === 8)
    assert(r.getInt(2) === 3)
  }

  test("minhash signature: empty and all-null shingle arrays both yield the all-null signature") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    // contract pinned: array_min over empty/all-null is null per
    // permutation — both degenerate inputs produce k null slots, and
    // persisted LSH indexes see one stable degenerate signature
    val r = spark.sql(
      """SELECT minhash_signature(array_remove(array(CAST(1 AS BIGINT)), 1), 4) AS empty_sig,
        |       minhash_signature(array(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)), 4) AS null_sig,
        |       minhash_signature(array(CAST(NULL AS BIGINT), CAST(7 AS BIGINT)), 4) AS mixed_sig
        |""".stripMargin).head()
    assert(r.getSeq[Any](0) === Seq(null, null, null, null))
    assert(r.getSeq[Any](1) === Seq(null, null, null, null))
    // a mixed array ignores null slots and hashes the real ones
    assert(r.getSeq[Any](2).forall(_ != null))
  }

  test("SQL surface rejects wrong-typed arguments at ANALYSIS, not with per-row crashes") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    // array<int> would make minhash's getLong silently misread bytes;
    // non-string rolling_hash previously failed codegen per row
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT minhash_signature(array(1, 2, 3), 4)").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT rolling_hash(123)").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT simhash64(array(1))").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT array_dot(array('a'), array('b'))").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT hyperplane_signatures(array('x'), 4, 2)").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT normalize_text(7)").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT word_shingles(7, 3)").collect())
  }

  test("vector kernels null-propagate on null ELEMENTS (HOF parity)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val r = df.select(
      graft.functions.VectorOps.array_dot(col("a"), col("b")).as("d"),
      graft.functions.VectorOps.hyperplane_signatures(col("a"), 4, 2, dim = 2).as("h"))
      .collect()(0)
    // pre-fix: the null slot read as 0.0 (UnsafeArrayData) — a silently
    // wrong dot product / signature instead of a null
    assert(r.isNullAt(0), "array_dot must null on a null element")
    assert(r.isNullAt(1), "hyperplane_signatures must null on a null element")
    // clean inputs still compute
    val ok = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(graft.functions.VectorOps.array_dot(col("a"), col("b"))).collect()(0)
    assert(ok.getDouble(0) === 11.0)
  }

  test("array_normalize kernel is bit-identical to the HOF transform/dot formulation") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the kernel replaced transform(a, x => x / sqrt(dot(a,a))) — which
    // re-evaluated the dot per ELEMENT (O(d²); lambda bodies are outside
    // subexpression elimination) — and must match it bit-for-bit,
    // including the null/zero/NaN/Inf edge semantics
    val vecs = Seq(
      Seq(3.0, 4.0), // plain
      Seq(0.0, 0.0), // zero norm → SQL x/0 → all-null
      Seq(1.0, Double.NaN), // NaN flows through
      Seq(Double.PositiveInfinity, 1.0), // Inf norm → 0.0 and NaN slots
      Seq(1e-320, 2e-320), // subnormals
      Seq.empty[Double]
    ).toDF("v")
    val both = vecs.select(
      graft.functions.VectorOps.array_normalize(col("v")).as("kernel"),
      transform(col("v"),
        x => x / sqrt(graft.functions.VectorOps.array_dot(col("v"), col("v")))).as("hof"))
      .collect()
    // compare via doubleToLongBits: NaN != NaN under ===, but both forms
    // must produce the same (canonicalized) bit pattern slot for slot
    def bits(s: Seq[Any]): Seq[String] = s.map {
      case null      => "null"
      case d: Double => java.lang.Double.doubleToLongBits(d).toString
      case x         => x.toString
    }
    both.foreach { r =>
      assert(bits(r.getSeq[Any](0)) === bits(r.getSeq[Any](1)), s"kernel/HOF divergence: $r")
    }
    // null element → EVERY slot null (dot null-propagates), same as HOF
    val withNull = Seq(Seq[java.lang.Double](1.0, null, 2.0)).toDF("v")
      .select(graft.functions.VectorOps.array_normalize(col("v"))).head().getSeq[Any](0)
    assert(withNull === Seq(null, null, null))
  }

  test("length-mismatched vectors: array_dot nulls (HOF parity), signatures fail loudly") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // zip_with null-pads the shorter array, so the HOF dot of a mismatched
    // pair is NULL — pre-fix the fused kernel returned a silently-partial
    // dot that could pass a similarity threshold
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(graft.functions.VectorOps.array_dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0), "array_dot must null on length mismatch, not truncate")
    // a dimension-mismatched vector would hash into arbitrary LSH buckets
    // if zero-padded/truncated — the kernel rejects it instead
    val e = intercept[Exception] {
      df.select(graft.functions.VectorOps.hyperplane_signatures(col("a"), 4, 2, dim = 2)).collect()
    }
    assert(e.getMessage.contains("plane dim") ||
      Option(e.getCause).exists(_.getMessage.contains("plane dim")),
      s"unexpected: ${e.getMessage}")
  }
}
