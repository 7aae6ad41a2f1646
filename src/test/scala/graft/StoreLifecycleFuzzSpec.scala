package graft

/** Randomized LIFECYCLE property test for the sharded store — drives the
  * shared harness in main ([[graft.jobs.LifecycleFuzz]]; the bench ledger
  * gates the same pinned seed): after ANY sequence of {batch append,
  * OPTIMIZE, OPTIMIZE FINAL, TTL expiry}, with varying codecs / granule
  * sizes / part-roll and merge-group bounds, every read surface (plain,
  * dedup=latest, sorted, AvailableNow streaming drain) must match the
  * in-memory model. Seeded: failures reproduce.
  */
class StoreLifecycleFuzzSpec extends SparkTestBase {

  test("any lifecycle interleaving preserves the model (seeded fuzz)") {
    graft.jobs.LifecycleFuzz.run(spark, seed = 20260815L, trials = 4)
  }
}
