package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property parity for q52's env-fallback dataflow against a DIRECT
  * Scala model of the reference loop (`/root/reference/src/config.rs:
  * 57-69`: scan env vars, keep keys that start `RUUVI_TAG_` and end
  * `_MAC`, strip both affixes for the index, look up the literal
  * `RUUVI_TAG_<idx>_NAME` sibling, keep the pair only if it exists).
  * The engine re-expresses the loop as two regexp projections + an
  * index equi-join; this spec pins the equivalence on generated
  * environments covering the adversarial key shapes — empty index,
  * index containing `_MAC`/`_NAME`, `RUUVI_TAG_MAC` (suffix overlaps
  * the prefix remainder), near-miss prefixes, orphan halves. */
class Q52PropSpec extends AnyFunSuite {
  import SparkTestSession.spark

  /** The reference loop, literally: Option-chained prefix/suffix strip
    * (strip_suffix on the already-stripped remainder, so
    * `RUUVI_TAG_MAC` falls out exactly as in Rust) + sibling lookup —
    * yielding the (idx, mac, name) CANDIDATE triples before the
    * HashMap insert collapses duplicate macs. */
  private def candidates(env: Seq[(String, String)]): Seq[(String, String, String)] = {
    val byKey = env.toMap
    env.flatMap { case (k, mac) =>
      for {
        rest <- if (k.startsWith("RUUVI_TAG_")) Some(k.drop("RUUVI_TAG_".length)) else None
        idx <- if (rest.endsWith("_MAC")) Some(rest.dropRight("_MAC".length)) else None
        name <- byKey.get(s"RUUVI_TAG_${idx}_NAME")
      } yield (idx, mac, name)
    }
  }

  /** The engine's declared refinement of the reference's
    * env-order-nondeterministic `tags.insert(mac, name)`: one entry per
    * mac, smallest index string wins (`Core.envFallback` scaladoc). */
  private def model(env: Seq[(String, String)]): Set[(String, String)] =
    candidates(env).groupBy(_._2).map { case (mac, cs) =>
      (mac, cs.minBy(_._1)._3)
    }.toSet

  private val keyGen: Gen[String] = for {
    prefix <- Gen.oneOf("RUUVI_TAG_", "RUUVI_TAGS_", "XRUUVI_TAG_", "RUUVI_TA_")
    // newline-bearing indexes pin the byte-literal semantics: an
    // anchored Java regex would accept a trailing-\n key ($ matches
    // before it) and reject an embedded-\n index (.* stops at it),
    // both diverging from the reference's strip_prefix/strip_suffix
    idx <- Gen.oneOf("", "1", "2", "42", "porch", "A_MAC", "B_NAME", "_",
      "MAC", "a\nb", "1\n")
    suffix <- Gen.oneOf("_MAC", "_NAME", "_NOTE", "MAC", "NAME", "", "_MAC\n")
  } yield prefix + idx + suffix

  test("generated environments: regexp-join dataflow ≡ the reference loop") {
    val envGen: Gen[Seq[(String, String)]] =
      Gen.chooseNum(0, 14).flatMap { n =>
        Gen.listOfN(n, keyGen).flatMap { keys =>
          // env keys are unique by construction; VALUES draw from a
          // 4-slot pool so distinct indices frequently carry the SAME
          // mac — the duplicate-mac collision the reference resolves by
          // nondeterministic env order and the engine pins to
          // smallest-index-wins (the round-10 documented refinement)
          Gen.listOfN(keys.distinct.length, Gen.oneOf("v0", "v1", "v2", "v3"))
            .map(vals => keys.distinct.zip(vals))
        }
      }
    var checked = 0
    val prop = Prop.forAll(envGen) { env =>
      val got = graft.queries.Core.envFallback(spark, env)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      checked += 1
      got == model(env)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, s"property failed: ${res.status}")
    assert(checked >= 60)
  }

  test("duplicate macs collapse to one row; smallest index STRING wins") {
    val env = Seq(
      "RUUVI_TAG_2_MAC" -> "AA", "RUUVI_TAG_2_NAME" -> "second",
      "RUUVI_TAG_10_MAC" -> "AA", "RUUVI_TAG_10_NAME" -> "tenth",
      "RUUVI_TAG_porch_MAC" -> "AA", "RUUVI_TAG_porch_NAME" -> "porchy")
    val got = graft.queries.Core.envFallback(spark, env)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // idx is an arbitrary STRING in the reference, so the pinned order
    // is lexicographic: "10" < "2" < "porch"
    assert(got == Set(("AA", "tenth")), s"got $got")
    assert(got == model(env))
    // refinement: the survivor is a candidate the reference's HashMap
    // could have kept under some env iteration order
    assert(candidates(env).map(c => (c._2, c._3)).contains(got.head))
  }

  test("the RUUVI_TAG_MAC corner: suffix overlapping the prefix remainder is skipped") {
    // "RUUVI_TAG_MAC" starts with the prefix and ends with "_MAC", but
    // the remainder after the prefix strip is "MAC", which does NOT end
    // with "_MAC" — the reference's strip_suffix (and the anchored
    // regex) both reject it
    val env = Seq(
      "RUUVI_TAG_MAC" -> "m0",
      "RUUVI_TAG__NAME" -> "n0", // would pair with the EMPTY index
      "RUUVI_TAG__MAC" -> "m1") // empty index: legal in the reference
    val got = graft.queries.Core.envFallback(spark, env)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("m1", "n0")), s"got $got")
    assert(got == model(env))
  }
}
