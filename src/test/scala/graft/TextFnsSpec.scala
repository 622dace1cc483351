package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** Property tests (SURVEY §5 item 2) for the text primitives. ScalaCheck
  * generates the corpora; each property is evaluated in a single batch
  * DataFrame pass (Column functions need a session to evaluate). */
class TextFnsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  private val doc = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docs: Seq[String] =
    Gen.listOfN(120, doc)(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get

  test("shingles: distinct, correct arity, count ≤ tokens−n+1; short docs → empty") {
    val rows = docs.toDF("text")
      .select(
        size(split(col("text"), " ")).as("ntok"),
        TextFns.shingles(col("text"), 3).as("sh"))
      .select(
        col("ntok"), size(col("sh")).as("nsh"),
        size(array_distinct(col("sh"))).as("ndis"),
        // every shingle has exactly 3 tokens
        size(filter(col("sh"), s => size(split(s, " ")) =!= 3)).as("badArity"))
      .collect()
    rows.foreach { r =>
      val (ntok, nsh, ndis, bad) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      if (ntok < 3) assert(nsh == 0, "short docs yield empty shingle sets (drop-not-null)")
      else {
        assert(nsh >= 1 && nsh <= ntok - 2)
        assert(ndis == nsh, "shingle sets are distinct")
        assert(bad == 0, "every shingle is an n-gram of exactly n tokens")
      }
    }
  }

  test("jaccard: self-similarity 1, bounds [0,1], symmetry") {
    val pairs = docs.zip(docs.reverse).toDF("a", "b")
      .select(TextFns.shingles(col("a"), 2).as("sa"), TextFns.shingles(col("b"), 2).as("sb"))
      .filter(size(col("sa")) > 0 && size(col("sb")) > 0)
      .select(
        TextFns.jaccard(col("sa"), col("sa")).as("self"),
        TextFns.jaccard(col("sa"), col("sb")).as("ab"),
        TextFns.jaccard(col("sb"), col("sa")).as("ba"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(1) == r.getDouble(2), "jaccard is symmetric")
    }
  }

  test("fingerprint: deterministic, 32-hex; equal docs ⇒ equal fingerprints") {
    val rows = docs.toDF("text")
      .select(
        TextFns.fingerprint(col("text"), 2).as("f1"),
        TextFns.fingerprint(col("text"), 2).as("f2"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getString(0).matches("[0-9a-f]{32}"))
    }
  }

  test("minhash component: element of the seeded-hash image, stable across seeds") {
    val rows = docs.toDF("text")
      .select(TextFns.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(
        TextFns.minhashComponent(col("sh"), 0).as("m0"),
        TextFns.minhashComponent(col("sh"), 1).as("m1"),
        // recompute m0's image and check membership
        array_contains(
          transform(col("sh"), x => md5(concat(lit("0:"), x).cast("binary"))),
          TextFns.minhashComponent(col("sh"), 0)).as("inImage"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), "minhash is the min of the seeded image")
      assert(r.getString(0).matches("[0-9a-f]{32}"))
    }
    // different seeds give different minima somewhere in the corpus
    assert(rows.exists(r => r.getString(0) != r.getString(1)))
  }

  test("permutation minhash: in-range, element of the permuted image, set-determined") {
    val (a, b, p) = (1000003L, 12345L, 1000000007L)
    val rows = docs.toDF("text")
      .select(TextFns.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("sh"), TextFns.shingleHashes(col("sh")).as("hs"))
      .select(
        TextFns.minhashPerm(col("hs"), a, b, p).as("m"),
        // shuffled shingle order must not change the signature (min is
        // order-free) — reverse is an order change that keeps the set
        TextFns.minhashPerm(reverse(col("hs")), a, b, p).as("mRev"),
        array_contains(
          transform(col("hs"), h => pmod(h * lit(a) + lit(b), lit(p))),
          TextFns.minhashPerm(col("hs"), a, b, p)).as("inImage"),
        array_max(col("hs")).as("maxH"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < p, "component lies in [0, p)")
      assert(r.getLong(0) == r.getLong(1), "signature depends on the set, not the order")
      assert(r.getBoolean(2), "component is the min of the permuted image")
      assert(r.getLong(3) < (1L << 28), "shingle hashes are 28-bit (overflow headroom)")
    }
  }

  test("hash60 fits in a signed long and is deterministic") {
    val rows = docs.take(50).toDF("text")
      .select(TextFns.hash60(col("text")).as("h1"), TextFns.hash60(col("text")).as("h2"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L, "60-bit hash is non-negative in a signed 64-bit long")
      assert(r.getLong(0) == r.getLong(1))
    }
  }
}
