package graft.ext

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Similarity invariants the oracle can't express: dirty-data behavior
  * (zero-norm embeddings) and the masked-key candidate contract, over a
  * synthetic embeddings table written to a temp dir. */
class SimilarityProps extends SparkSpec {

  /** Synthetic corpus: 40 seeded-random unit-ish vectors, one planted
    * identical pair (1, 2), and an all-zero vector (5). */
  private lazy val dir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val base = (0 until 40).map(i => (i.toLong, vec(), i % 4))
    val rows = base.map {
      case (2L, _, lab) => (2L, base(1)._2, lab)        // clone of vec 1
      case (5L, _, lab) => (5L, Array.fill(64)(0f), lab) // zero norm
      case r => r
    }
    val d = java.nio.file.Files.createTempDirectory("graft_simprops").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("MMR rerank demotes a clone below a diverse lower-relevance result") {
    import spark.implicits._
    // 2-D geometry padded to 64 dims; q = vec 0 = (1,0).
    //   v1 = (0.96, 0.28)  rel .96
    //   v2 = clone of v1   rel .96, sim(1,2) = 1.0
    //   v3 = (0.8, −0.6)   rel .80, sim(1,3) = sim(2,3) = 0.6
    // round 1: 0.7·.96 = .672 → v1 (id tie-break beats its clone)
    // round 2: v2 = .672 − .3·1.0 = .372 < v3 = .56 − .3·.6 = .38 → v3
    //   (the DIVERSIFICATION flip: the clone loses to lower relevance)
    // round 3: v2 at .372; round 4: pool exhausted → only 3 rows
    def pad(a: Float, b: Float): Array[Float] =
      Array(a, b) ++ Array.fill(62)(0f)
    val d = Seq(
      (0L, pad(1f, 0f)), (1L, pad(0.96f, 0.28f)),
      (2L, pad(0.96f, 0.28f)), (3L, pad(0.8f, -0.6f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 0.96, 0.672),
      (2L, 3L, 0.8, 0.38),
      (3L, 2L, 0.96, 0.372)))
  }

  test("Q24 centroids equal an exact BigInt reference on random vectors") {
    import spark.implicits._
    // the fixed-point accumulation claims BIT-exact, order-free means:
    // recompute them with arbitrary-precision integers on the driver
    // and require equality to the last bit of every double
    val rnd = new scala.util.Random(3L)
    val dims = 64
    val rows = (0L until 60L).map { i =>
      (i % 5L, Array.fill(dims)((rnd.nextFloat() * 2 - 1).toDouble))
    }
    def q24(x: Double): Long =
      new java.math.BigDecimal(x * (1L << 24).toDouble)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val expected: Map[Long, Array[Double]] = rows.groupBy(_._1).map {
      case (cell, rs) =>
        cell -> (0 until dims).map { d =>
          val s = rs.map(r => BigInt(q24(r._2(d)))).sum
          s.toDouble / (1L << 24).toDouble / rs.size
        }.toArray
    }
    val got = Similarity.centroids(rows.toDF("cell", "v"), "cell")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (cell, arr) =>
      assert(arr.sameElements(expected(cell)), s"cell $cell centroid diverged")
    }
  }

  test("Q24 composite-key centroids (centroidsK) equal the BigInt reference") {
    import spark.implicits._
    // same exactness contract as the single-key property above, on the
    // PQ codebook's composite (subspace, code) grouping and subvector
    // dimensionality
    val rnd = new scala.util.Random(7L)
    val dims = 8
    val rows = (0L until 96L).map { i =>
      ((i % 4L).toInt, (i % 3L).toInt,
        Array.fill(dims)((rnd.nextFloat() * 2 - 1).toDouble))
    }
    def q24(x: Double): Long =
      new java.math.BigDecimal(x * (1L << 24).toDouble)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val expected: Map[(Int, Int), Array[Double]] = rows.groupBy(r => (r._1, r._2)).map {
      case (k, rs) =>
        k -> (0 until dims).map { d =>
          val s = rs.map(r => BigInt(q24(r._3(d)))).sum
          s.toDouble / (1L << 24).toDouble / rs.size
        }.toArray
    }
    val got = Similarity.centroidsK(rows.toDF("m", "code_id", "v"),
        Seq("m", "code_id"), dims)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getSeq[Double](2).toArray).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, arr) =>
      assert(arr.sameElements(expected(k)), s"cell $k centroid diverged")
    }
  }

  test("PQ: clones encode to identical codes; zero-norm rows are legal under L2") {
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val sub = Similarity.pqSubvectors(e)
    val codes = Similarity.pqAssign(sub, Similarity.pqTrainedCodebook(sub))
      .select(col("vec_id"), col("m"), col("code_id"))
    def codesOf(id: Long): Seq[Int] = codes.filter(col("vec_id") === id)
      .orderBy(col("m")).collect().map(_.getInt(2)).toSeq
    // the planted clone pair must compress identically — PQ cannot
    // tell identical vectors apart, by construction
    assert(codesOf(1L) == codesOf(2L))
    // the all-zero vector has FINITE L2² to every code (unlike cosine,
    // which NaNs on zero norm): it encodes to a full, valid code tuple
    val c5 = codesOf(5L)
    assert(c5.length == Similarity.PqSubspaces &&
      c5.forall(c => c >= 0 && c < Similarity.PqCodes), c5.toString)
  }

  test("zero-norm embeddings never surface from the NaN guard; clones always do") {
    import spark.implicits._
    val out = SparkEntry.queries("sim_neardup_lsh")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // the zero vector's cosine with anything is 0/0 = NaN, which >= would
    // keep in BOTH engines — the guard must drop it
    assert(out.forall { case (a, b, s) => a != 5L && b != 5L && !s.isNaN },
      s"zero-norm vector leaked into near-dups: $out")
    // an identical pair collides in every table (same signature) and
    // verifies at cosine 1
    assert(out.exists { case (a, b, s) => a == 1L && b == 2L && s == 1.0 },
      s"planted clone pair missing: $out")
  }

  test("candidate pairs are exactly the sketch pairs within Hamming 1 of some table") {
    import spark.implicits._
    // ground truth: signatures recomputed in the driver from the same
    // plane construction (strict left-to-right fold, like the kernel)
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val buckets =
      e.as[(Long, Array[Double])].collect().map { case (id, v) =>
        id -> (0 until Similarity.LshTables).map { t =>
          (0 until Similarity.LshBits).map { p =>
            var acc = 0.0; var i = 0
            while (i < 64) { acc += Similarity.planeSign(t * Similarity.LshBits + p, i) * v(i); i += 1 }
            if (acc > 0) 1L << p else 0L
          }.sum
        }
      }.toMap
    val ids = buckets.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if (0 until Similarity.LshTables).exists(t =>
        java.lang.Long.bitCount(buckets(a)(t) ^ buckets(b)(t)) <= 1)
    } yield (a, b)).toSet
    // exactness both ways: surfaced ⊆ Hamming≤1 candidates, and every
    // candidate whose exact cosine passes the threshold is surfaced —
    // a regression that silently loses Hamming-1 collisions (e.g. a tag
    // mismatch reducing the join to Hamming-0) fails the second half
    val surfaced = SparkEntry.queries("sim_neardup_lsh")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(surfaced.subsetOf(expected),
      s"surfaced pairs outside Hamming<=1 candidates: ${surfaced -- expected}")
    val vecs = e.as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val shouldSurface = expected.filter { case (a, b) =>
      val raw = cos(vecs(a), vecs(b)) // NaN for the zero-norm vector
      !raw.isNaN && java.math.BigDecimal.valueOf(raw)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() >= 0.4
    }
    assert(shouldSurface.subsetOf(surfaced),
      s"passing candidates lost: ${shouldSurface -- surfaced}")
    assert(expected.contains((1L, 2L)))
  }
}
