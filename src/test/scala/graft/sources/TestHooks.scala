package graft.sources

/** Test-scope access to package-private source internals. */
object TestHooks {

  /** Line-iterator facade over the package-private [[ByteRangeLines]] for
    * property tests: next() until null.
    */
  def byteRangeLines(path: String, start: Long, end: Long): () => Array[Byte] = {
    val inner = new ByteRangeLines(path, start, end)
    () => inner.next()
  }

  /** Drive [[StatusLiveScan.releaseAtQueryEnd]]'s executed-planning
    * guard directly: the listener's drain with a caller-chosen "what the
    * completed query executed" argument — the concurrency the guard
    * exists for is two actions interleaving, which a spec can state
    * deterministically this way but not reproduce on the listener bus.
    */
  def releaseAtQueryEnd(scan: StatusLiveScan,
      executed: Option[Seq[org.apache.spark.sql.connector.read.InputPartition]]): Boolean =
    scan.releaseAtQueryEnd(executed)
}
