package graft.examples

/** Does t23's BPE merge-loop cost stay flat per round as the merge
  * budget grows? The oracle-checked surface unrolls 5 rounds; a real
  * tokenizer-training budget is 10⁴⁺ merges, so the loop's per-round
  * cost — one |vocab|-sized pair aggregate + a 1-row broadcast + the
  * fold apply, with a `localCheckpoint` pinning each generation — must
  * not grow with the round index. The suspected cliff (round-11
  * verdict): checkpoint lineage stacking — each round's `vocab` pins a
  * new block set; if the driver-side plan or block bookkeeping grows,
  * later rounds pay more for identical data sizes.
  *
  * Measurement: `bpeTrainRounds(rounds = 20)` at the given sf, wall
  * per round via the per-round hook, vocab row count per round (flat
  * by construction — merges only re-segment, the word dictionary never
  * shrinks). A growing per-round wall at constant vocab size = the
  * lineage/bookkeeping cliff; the fix would be a re-used write-read
  * vocab table instead of checkpoint chains.
  *
  * Usage: runMain graft.examples.BpeRoundsProbe [sfDir] [rounds]
  */
object BpeRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.Engine.session()
    println(f"${"round"}%5s ${"wall_s"}%7s ${"vocab_rows"}%10s")
    var t0 = System.nanoTime()
    graft.queries.TextQueries.bpeTrainRounds(spark, sfDir, rounds) {
      (r, vocab) =>
        val n = vocab.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$r%5d $wall%7.2f $n%10d")
        t0 = System.nanoTime()
    }
    spark.stop()
  }
}
