package graft.tools

/** Fresh-seed pagination fuzz campaign — the per-round soak (NOTES.md
  * tradition: every round closes with a multi-thousand-trial run on a
  * seed the tree has never seen, beyond the pinned-seed bench/spec
  * entries).
  *
  * Usage: runMain graft.tools.FuzzSoak [seed] [trials]
  */
object FuzzSoak {
  def main(args: Array[String]): Unit = {
    val seed = args.lift(0).map(_.toLong).getOrElse(19202608L)
    val trials = args.lift(1).map(_.toInt).getOrElse(3000)
    val t0 = System.nanoTime()
    graft.sources.PaginationFuzz.run(seed, trials)
    println(f"[fuzzsoak] $trials trials seed $seed clean in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
