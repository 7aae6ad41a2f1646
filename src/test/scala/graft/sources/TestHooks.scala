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
}
