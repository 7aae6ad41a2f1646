package graft.sources

import java.io.File

/** The sparse GRANULE (mark) index of one sorted part file — the text
  * store's form of MergeTree's primary-key mark index, which is how the
  * reference's ClickHouse table serves point/range reads off `ORDER BY
  * (token_id, timestamp)` WITHOUT scanning parts (clickhouse.go:65-87
  * [ext]). One entry per `granuleRows` rows. Two on-disk versions:
  *
  *   - `g1` (r10): `<byte offset>,<first token_id|''>,<first ts_us|''>`
  *   - `g2` (r11): `g1`'s fields plus `,<granule ts min|''>,<granule ts
  *     max|''>` — the granule's NON-NULL ts extremes (empty = the granule
  *     has no non-null ts). This is MergeTree's granule-level `minmax`
  *     SKIP index on the time column: within a part only (token, ts) is
  *     ordered, so ts alone cannot be binary-searched — but a per-granule
  *     ts band prunes time-window scans of FINAL-compacted parts (which
  *     span the shard's whole ts range at part level) conservatively,
  *     granule by granule.
  *
  * written by [[PartStreamWriter]] (`.<part>.granules`). Because parts are
  * sorted by (token_id NULLS FIRST, ts_us NULLS FIRST), the entries'
  * first-keys are ascending, so a pushed token (or token+ts) predicate
  * BINARY-SEARCHES to a granule range instead of parsing the part — the
  * intra-part skip that keeps point lookups cheap on a FINAL-compacted
  * store whose part-level minmax/bloom indexes are saturated by
  * construction (r9 verdict Next #1). Ts bands then REFINE a token's
  * granule range, and serve time-only predicates on their own.
  *
  * Offsets are positions in the part file AS STORED: for `gzip`/`zstd`
  * parts every granule is its own compression frame, so an offset is a
  * legal decompression start — which is also what makes compressed parts
  * byte-range SPLITTABLE at granule boundaries.
  *
  * A missing or unparsable index reads as "no index" (no pruning, never a
  * wrong prune) — same conservative rule as the minmax sidecars. A `g1`
  * file reads as "no bands" (token pruning only).
  */
private[graft] final class GranuleIndex(
    // column-major: ascending offsets; first (token, ts) of each granule,
    // null encoded as (nullFlag=true, 0)
    val offsets: Array[Long],
    tokNull: Array[Boolean], tok: Array[Long],
    tsNull: Array[Boolean], ts: Array[Long],
    // per-granule ts minmax band over non-null ts; bandSeen=false = the
    // granule holds only null ts (or: no bands at all, see hasBands)
    val hasBands: Boolean,
    bandSeen: Array[Boolean], bandMin: Array[Long], bandMax: Array[Long]) {

  def size: Int = offsets.length

  /** first-key(g) vs the query point (t, q): negative when the granule's
    * first key sorts strictly below. NULLS FIRST on both components. The
    * query point's token is never null (null-rejecting token predicates),
    * but its TS component IS the null floor (`qNull=true`) when the
    * predicate has no ts lower bound: by SQL semantics a bare token-IN
    * keeps (token, null-ts) rows, and under NULLS-FIRST ordering those
    * sort below every non-null ts — so the box's lower corner is
    * (token, NULL), which compares EQUAL to a null-ts first key (not
    * below it; r10 verdict What's-wrong #1 — returning -1 here made the
    * strict lower bound land ON the (token, null) granule and silently
    * drop (token, null) rows at the tail of the granule before it).
    */
  private def cmpKey(g: Int, t: Long, qNull: Boolean, q: Long): Int = {
    if (tokNull(g)) return -1
    val c = java.lang.Long.compare(tok(g), t)
    if (c != 0) return c
    if (tsNull(g)) { if (qNull) 0 else -1 }
    else if (qNull) 1
    else java.lang.Long.compare(ts(g), q)
  }

  /** Largest g with cmpKey(g) `< 0` (strict=true) / `<= 0` (strict=false),
    * or -1.
    */
  private def lastBelow(t: Long, qNull: Boolean, q: Long, strict: Boolean): Int = {
    var lo = 0; var hi = size - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = cmpKey(mid, t, qNull, q)
      if (c < 0 || (!strict && c == 0)) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    res
  }

  /** Granule index range [a, b] that can contain rows with token `t` and
    * ts in [lo, hi] (inclusive, conservative), or None when provably empty.
    * `loNull=true` means the box has NO ts lower bound, so its lower
    * corner is (t, NULL) — null-ts rows of `t` are inside the box.
    *
    * Upper: granules after the last one whose first key ≤ (t, hi) start
    * strictly above the query box. Lower: granules before the last one
    * whose first key < (t, loCorner) end at a first-key strictly below the
    * box (a boundary row EQUAL to the next granule's first key stays
    * covered because the bound is strict).
    */
  def granuleRangeFor(t: Long, loNull: Boolean, lo: Long, hi: Long): Option[(Int, Int)] = {
    val b = lastBelow(t, qNull = false, hi, strict = false)
    if (b < 0) return None // the whole file starts above (t, hi)
    val a = math.max(lastBelow(t, loNull, lo, strict = true), 0)
    Some((a, b))
  }

  /** Can granule `g` hold a row satisfying the ts bounds? `true` when the
    * index has no bands (g1 — nothing to prove) or the band overlaps the
    * query interval. A band-less granule (only null ts) can satisfy NO ts
    * bound: SQL comparisons reject null, exactly the TTL-on-NULL rule the
    * row predicate applies at parse time.
    */
  def bandMayMatch(g: Int, tsMin: Option[(Long, Boolean)],
      tsMax: Option[(Long, Boolean)]): Boolean = {
    if (!hasBands) return true
    if (tsMin.isEmpty && tsMax.isEmpty) return true
    if (!bandSeen(g)) return false
    tsMin.forall { case (lo, inc) => if (inc) bandMax(g) >= lo else bandMax(g) > lo } &&
      tsMax.forall { case (hi, inc) => if (inc) bandMin(g) <= hi else bandMin(g) < hi }
  }
}

private[graft] object GranuleIndex {
  val Header = "g1"
  val Header2 = "g2"

  def granuleName(partName: String): String = s".$partName.granules"
  def granuleFor(part: File): File = new File(part.getParentFile, granuleName(part.getName))

  /** Per-scan cap on the token IN-set size granule selection will walk —
    * beyond it the selection degrades to ts-band-only pruning (a set that
    * large touches most granules anyway, and per-token binary searches
    * stop being free).
    */
  val MaxSelectTokens: Int = 4096

  /** Mark-file parses (test shim: pins the one-read-per-part-per-scan
    * contract of the driver-side caches — `GranuleIndexSpec`).
    */
  private[graft] val readCount = new java.util.concurrent.atomic.AtomicLong

  def read(part: File): Option[GranuleIndex] = {
    val f = granuleFor(part)
    if (!f.isFile) return None
    readCount.incrementAndGet()
    try {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val lines = try src.getLines().toArray finally src.close()
      if (lines.length < 3) return None // <2 granules: no index
      val v2 = lines(0).trim == Header2
      if (!v2 && lines(0).trim != Header) return None
      val width = if (v2) 5 else 3
      val n = lines.length - 1
      val offsets = new Array[Long](n)
      val tokNull = new Array[Boolean](n); val tok = new Array[Long](n)
      val tsNull = new Array[Boolean](n); val ts = new Array[Long](n)
      val bandSeen = new Array[Boolean](n)
      val bandMin = new Array[Long](n); val bandMax = new Array[Long](n)
      var prev = -1L
      var i = 0
      while (i < n) {
        val p = lines(i + 1).split(",", -1)
        if (p.length != width) return None
        offsets(i) = p(0).toLong
        if (offsets(i) <= prev) return None // offsets must strictly ascend
        prev = offsets(i)
        if (p(1).isEmpty) tokNull(i) = true else tok(i) = p(1).toLong
        if (p(2).isEmpty) tsNull(i) = true else ts(i) = p(2).toLong
        if (v2 && p(3).nonEmpty && p(4).nonEmpty) {
          bandSeen(i) = true; bandMin(i) = p(3).toLong; bandMax(i) = p(4).toLong
        }
        i += 1
      }
      if (offsets(0) != 0L) return None // first granule starts at the file head
      Some(new GranuleIndex(offsets, tokNull, tok, tsNull, ts, v2, bandSeen, bandMin, bandMax))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** BYTE ranges of `part` a reader must parse to evaluate `pred`, or None
    * for "read the whole file" (no index, or no prunable predicate
    * component: no small token set AND no ts bound a g2 band could serve).
    * Ranges are ascending, disjoint, granule-aligned; the final range's
    * end is `Long.MaxValue` when it reaches the file tail (the reader
    * treats it as to-EOF, so the part's on-disk length is never needed
    * here).
    */
  def selectRanges(part: File, pred: ShardRowPredicate): Option[Seq[(Long, Long)]] =
    selectRangesWith(read(part), pred)

  /** `selectRanges` against an already-parsed index — the driver-side
    * callers (statistics, split planning) cache the parse per scan and
    * must not repeat the mark-file IO per invocation (ADVICE r10).
    */
  def selectRangesWith(index: Option[GranuleIndex],
      pred: ShardRowPredicate): Option[Seq[(Long, Long)]] = {
    val idx = index.getOrElse(return None)
    val tokens: Option[Array[Long]] = pred.tokenIn match {
      case Some(s) if s.size <= MaxSelectTokens =>
        val a = s.toArray; java.util.Arrays.sort(a); Some(a)
      case Some(_) => None
      case None => pred.tokenSorted match {
        case Some(arr) if arr.length <= MaxSelectTokens => Some(arr)
        case _ => None
      }
    }
    val hasTsPred = pred.tsMin.isDefined || pred.tsMax.isDefined
    val bands = hasTsPred && idx.hasBands
    if (tokens.isEmpty && !bands) return None // nothing prunable: whole file
    if (tokens.exists(_.isEmpty)) return Some(Seq.empty) // empty IN-set

    // no ts lower bound → the box floor is (token, NULL): a bare token
    // predicate keeps null-ts rows, which sort FIRST within the token
    val loNull = pred.tsMin.isEmpty
    val lo = pred.tsMin.map(_._1).getOrElse(Long.MinValue)
    val hi = pred.tsMax.map(_._1).getOrElse(Long.MaxValue)

    val granuleRanges: Seq[(Int, Int)] = tokens match {
      case Some(toks) if !bands =>
        // per-token granule ranges (tokens ascending → ranges ascending),
        // coalescing touching/overlapping ones
        val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var i = 0
        while (i < toks.length) {
          idx.granuleRangeFor(toks(i), loNull, lo, hi).foreach { case (a, b) =>
            if (ranges.nonEmpty && a <= ranges.last._2 + 1) {
              val (pa, pb) = ranges.last
              if (b > pb) ranges(ranges.length - 1) = (pa, b)
            } else ranges += ((a, b))
          }
          i += 1
        }
        ranges.toSeq
      case Some(toks) =>
        // token ranges REFINED by the ts bands: a granule provably outside
        // the time window drops even inside a token's range. Band-filtered
        // sub-ranges of later tokens can interleave earlier ones, so mark
        // bits first, coalesce once.
        val hit = new java.util.BitSet(idx.size)
        var i = 0
        while (i < toks.length) {
          idx.granuleRangeFor(toks(i), loNull, lo, hi).foreach { case (a, b) =>
            var g = a
            while (g <= b) {
              if (!hit.get(g) && idx.bandMayMatch(g, pred.tsMin, pred.tsMax)) hit.set(g)
              g += 1
            }
          }
          i += 1
        }
        bitsToRanges(hit)
      case None =>
        // time-only predicate over the g2 bands: MergeTree's granule-level
        // minmax skip — the path that makes a time-window scan of a
        // FINAL-compacted part parse this week's granules, not the shard
        val hit = new java.util.BitSet(idx.size)
        var g = 0
        while (g < idx.size) {
          if (idx.bandMayMatch(g, pred.tsMin, pred.tsMax)) hit.set(g)
          g += 1
        }
        bitsToRanges(hit)
    }
    Some(granuleRanges.map { case (a, b) =>
      (idx.offsets(a), if (b + 1 < idx.size) idx.offsets(b + 1) else Long.MaxValue)
    })
  }

  private def bitsToRanges(hit: java.util.BitSet): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var a = hit.nextSetBit(0)
    while (a >= 0) {
      val end = hit.nextClearBit(a)
      out += ((a, end - 1))
      a = hit.nextSetBit(end)
    }
    out.toSeq
  }

  /** Granule-boundary CUT offsets for byte-range splitting a part whose
    * stored form is compressed (frames align with granules): walk the
    * offsets and cut roughly every `splitBytes` COMPRESSED bytes. Returns
    * None when the part has no index (non-splittable, as before) and
    * Nil-of-one when it is smaller than one split.
    */
  def splitOffsets(part: File, splitBytes: Long): Option[Seq[Long]] =
    splitOffsetsWith(read(part), splitBytes)

  /** `splitOffsets` against an already-parsed index (see
    * [[selectRangesWith]]).
    */
  def splitOffsetsWith(index: Option[GranuleIndex], splitBytes: Long): Option[Seq[Long]] =
    index.map { idx =>
      val cuts = scala.collection.mutable.ArrayBuffer(0L)
      var i = 1
      while (i < idx.size) {
        if (idx.offsets(i) - cuts.last >= splitBytes) cuts += idx.offsets(i)
        i += 1
      }
      cuts.toSeq
    }
}
