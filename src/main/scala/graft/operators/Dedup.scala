package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard with prefix filtering.
  *
  * Scale posture (the part that matters at 100 TB): every algorithm here is
  * **candidate-generation by equi-join on a bucket key** — never an n²
  * cross-join. MinHash banding and SimHash banding both reduce pair
  * generation to a shuffle on (band, key); exact Jaccard uses prefix
  * filtering (PPJoin-style) so the inverted index only contains each set's
  * rarest prefix. All hashing is engine-portable md5 arithmetic
  * ([[graft.functions.TextFunctions]]) so a DuckDB oracle can replay it.
  *
  * Cache lifecycle: operators that reuse an intermediate (shingle sets,
  * frequency-ordered sets) `.cache()` it for the duration of the query;
  * the CALLER owns cleanup (`spark.catalog.clearCache()` between jobs, as
  * Verify does per query) — a long-lived session invoking these in a loop
  * without clearing will accumulate cached tables.
  */
object Dedup {

  /** MinHash affine coefficients (a_i odd, b_i arbitrary, both < p),
    * derived from fixed multiplicative constants — deterministic across
    * engines and runs.
    */
  val NumHashes = 16
  val MinhashCoeffs: Seq[(Long, Long)] =
    (0 until NumHashes).map { i =>
      (((i + 1) * 2654435761L % HashPrime) | 1L, ((i + 1) * 1013904223L + 12345L) % HashPrime)
    }

  val LshBands = 4
  val LshRows = 4 // NumHashes / LshBands

  /** (id, text) → (id, sh: array<long>) distinct k-shingle hashes. Tokens
    * are staged as their own projection first (see [[TextFunctions.shingles]]
    * — an inlined tokenizer would re-split per shingle window).
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), array_distinct(graft.functions.HashExpressions.shingleHash32(col("toks"), k)).as("sh"))
      .where(size(col("sh")) > 0)

  /** Containment (near-superset) pairs: |A∩B| / |A| ≥ τ over k-shingle
    * sets — the ASYMMETRIC relative of Jaccard, catching excerpts/quotes
    * whose size ratio pushes symmetric similarity below any workable
    * threshold. Candidates come from an equi-join on shared shingles with
    * a document-frequency stop-guard (shingles in > `maxDf` docs are
    * boilerplate and would explode any bucket — q61's discipline); the
    * exact containment verify runs only on candidates, over the already
    * distinct shingle sets. Output (id_a, id_b, containment) = a contained
    * in b, both directions emitted independently.
    */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, maxDf: Int = 50): DataFrame = {
    // cache, not localCheckpoint: measured both (r18) — the checkpoint
    // truncates the re-planned subtree but its materialization job is a
    // barrier on the SERIAL corpus scan (one row group at bench SF) and
    // costs an extra pass; pipelining through the cached first consumer
    // wins for corpus-sized text tables (q89 2.40 → 2.75 s checkpointed).
    val sets = shingleSets(docs, idCol, textCol, k).cache()
    val ds = sets.select(col(idCol), explode(col("sh")).as("h"))
    val rare = ds.join(
      ds.groupBy(col("h")).agg(count(lit(1)).as("df")).where(col("df") <= maxDf).select(col("h")),
      "h")
    // one UNORDERED candidate pair per shared rare shingle (a < b): one
    // intersection then serves BOTH directions' containments — half the
    // candidate join and verify of the naive a != b formulation.
    val cand = rare.select(col(idCol).as("id_a"), col("h"))
      .join(rare.select(col(idCol).as("id_b"), col("h")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val verified = cand
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sa")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("double").as("i"),
        size(col("sa")).cast("double").as("na"),
        size(col("sb")).cast("double").as("nb"))
    // both directions from ONE verify pass: the union-of-two-projections
    // form re-ran the candidate join AND the per-pair array_intersect for
    // each direction (the plan audit read the whole verify subtree twice
    // under the Union) — one row explodes into its ≤2 passing directions
    // instead (r18, guide §2.4). Same row set.
    verified
      .select(explode(array(
        struct(col("id_a"), col("id_b"), (col("i") / col("na")).as("containment")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b"),
          (col("i") / col("nb")).as("containment")))).as("e"))
      .select(col("e.id_a").as("id_a"), col("e.id_b").as("id_b"),
        col("e.containment").as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Exact duplicate groups by content hash: every row keyed by md5(text),
    * kept = the group's min id. A single hash-aggregate — the cheapest and
    * first dedup pass of any pipeline.
    */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: sig_i = min over shingle hashes h of (a_i·h+b_i) mod p. */
  def minhashSignature(sh: Column): Column =
    array(MinhashCoeffs.map { case (a, b) =>
      array_min(transform(sh, h => pmod(h * a + b, lit(HashPrime))))
    }: _*)

  /** Array of whole-band keys from a signature column: band b = rows
    * [b·LshRows, (b+1)·LshRows) joined into one string key.
    */
  private def bandArray(sig: Column): Column =
    array((0 until LshBands).map(b =>
      concat_ws(",", (0 until LshRows).map(r => element_at(sig, b * LshRows + r + 1)): _*)): _*)

  /** LSH candidate pairs: signatures split into [[LshBands]] bands of
    * [[LshRows]] rows; docs colliding on an entire band become candidates.
    * The self-join shuffles on the (band, key) pair — uniform, narrow keys.
    */
  def lshCandidatePairs(sigs: DataFrame, idCol: String): DataFrame = {
    // lazy localCheckpoint so the self-join's two sides read ONE
    // materialized banded table (narrow: id, band, key — 4 rows/doc)
    // instead of each side recomputing the 16-min-hash signature subtree,
    // AND the declared plan drops the duplicated subtree (cache stops
    // re-execution but not re-planning; measured ~8% faster than cache
    // here — the banded table is narrow and post-projection, so the
    // materialization barrier the corpus-sized tables hit does not bite).
    // Safe under foreachBatch: the micro-batch df is a plain batch df.
    val banded = sigs.select(
      col(idCol),
      posexplode(bandArray(col("sig"))).as(Seq("band", "key"))
    ).localCheckpoint(false)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Verify candidate pairs with exact Jaccard over the shingle sets and
    * keep those at/above the threshold. Joins are on the narrow id key;
    * the arrays ride along only for the final intersect/union.
    */
  def jaccardVerify(pairs: DataFrame, shSets: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val sa = shSets.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val sb = shSets.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    pairs
      .join(sa, "id_a")
      .join(sb, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType))
      .withColumn("uni", (size(col("sh_a")) + size(col("sh_b"))).cast(LongType) - col("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → bucket-join
    * → exact-Jaccard verify.
    */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String, k: Int, threshold: Double): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k).cache()
    val sigs = sets.select(col(idCol), minhashSignature(col("sh")).as("sig"))
    jaccardVerify(lshCandidatePairs(sigs, idCol), sets, idCol, threshold)
  }

  /** Exact n-gram Jaccard similarity join, full PPJoin: **frequency-ordered
    * prefix filtering** with asymmetric probe/index prefixes and an
    * **accumulated positional filter**. τ is a rational `tNum/tDen` so every
    * bound is exact integer arithmetic (no float-ceiling edge cases
    * cross-engine).
    *
    * Structure (all equi-joins and hash aggregates — never n²):
    *   1. Every set is re-ordered by ascending global document frequency
    *      (ties by hash) so prefixes hold the RAREST shingles — on a
    *      repetitive corpus this is what keeps inverted-index buckets small
    *      (hash-ordered prefixes admit hot shingles and the candidate join
    *      explodes; measured 603k → 135k joined rows at sf0.1).
    *   2. Asymmetric prefixes: the probe side indexes its first
    *      n − ⌈τ·n⌉ + 1 elements, the index side only its first
    *      n − ⌈2τ/(1+τ)·n⌉ + 1. A pair (s, l) with |s| ≤ |l| and
    *      Jaccard ≥ τ must collide between l's probe prefix and s's index
    *      prefix (overlap α = ⌈τ/(1+τ)(|s|+|l|)⌉ ≥ ⌈2τ/(1+τ)|s|⌉ and
    *      ≥ ⌈τ|l|⌉), so indexing the shorter prefix is lossless.
    *   3. Length filter: Jaccard ≥ τ ⇒ τ·|l| ≤ |s| — one cheap conjunct
    *      inside the join.
    *   4. Accumulated positional filter: per candidate pair, c = number of
    *      prefix collisions and (mpa, mpb) = positions of the deepest one.
    *      Because both arrays share one total order, every common element
    *      beyond the deepest collision sits strictly after it in BOTH
    *      arrays, so overlap ≤ c + min(na−1−mpa, nb−1−mpb); pairs that
    *      can't reach α are dropped by the same groupBy that dedups
    *      candidates (no separate distinct). Lossless: only non-viable
    *      candidates disappear before the exact verify.
    */
  def ngramJaccardJoin(docs: DataFrame, idCol: String, textCol: String, k: Int, tNum: Int, tDen: Int): DataFrame = {
    val base = shingleSets(docs, idCol, textCol, k).cache()
    val ds = base.select(col(idCol), explode(col("sh")).as("h"))
    val dfreq = ds.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Re-order each set by (df asc, h asc) — one total order shared by all
    // sets, which both the prefix lemma and the positional bound require.
    val sets = ds
      .join(dfreq, "h")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("dh"))
      .select(col(idCol), transform(col("dh"), x => x.getField("h")).as("sh"))
      // lazy localCheckpoint, not cache: EVERYTHING downstream (both
      // prefix sides + both verify sides) reads only `sets`, so the
      // checkpoint truncates the shingle+df+reorder subtree out of four
      // consumers' plans (q41 366-line plan, q65 535 — the cascade nests
      // the rep-selection under each copy). Unlike `base` above — where a
      // checkpoint barrier would serialize on the one-row-group corpus
      // scan, measured slower than cache — `sets` sits BEHIND two
      // exchanges, so its materialization is already post-shuffle
      // parallel and the barrier costs nothing extra (r18, guide §3.3)
      .localCheckpoint(false)
    val n = size(col("sh"))
    // ceil(x/y) with integer arithmetic: (x + y - 1) div y
    val probeLen = (n - floor((n * tNum + tDen - 1) / tDen) + 1).cast(IntegerType)
    val indexLen = (n - floor((n * 2 * tNum + tDen + tNum - 1) / (tDen + tNum)) + 1).cast(IntegerType)
    def prefixes(len: Column) = sets.select(
      col(idCol),
      n.as("n"),
      posexplode(slice(col("sh"), lit(1), len)).as(Seq("pos", "h"))
    )
    val a = prefixes(probeLen).select(col(idCol).as("ida"), col("n").as("na"), col("pos").as("pa"), col("h"))
    val b = prefixes(indexLen).select(col(idCol).as("idb"), col("n").as("nb"), col("pos").as("pb"), col("h"))
    val minOverlap = floor(((col("na") + col("nb")) * tNum + tDen + tNum - 1) / (tDen + tNum))
    val cands = a.join(b, Seq("h"))
      // exactly one orientation per unordered pair: longer probes shorter,
      // id tiebreak on equal sizes (keeps the positional stats coherent)
      .where(col("na") > col("nb") || (col("na") === col("nb") && col("ida") < col("idb")))
      .where(col("nb") * tDen >= col("na") * tNum) // length filter
      .groupBy(
        least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        col("na"), col("nb"))
      .agg(count(lit(1)).as("c"), max(col("pa")).as("mpa"), max(col("pb")).as("mpb"))
      .where(col("c") + least(col("na") - 1 - col("mpa"), col("nb") - 1 - col("mpb")) >= minOverlap)
      .select("id_a", "id_b")
    jaccardVerify(cands, sets, idCol, tNum.toDouble / tDen.toDouble)
  }

  /** Persistable MinHash index for INCREMENTAL dedup: the banded-signature
    * table (id, band, key) and the shingle-set table (id, sh) — both plain
    * DataFrames, written once per corpus snapshot (parquet, partitioned by
    * band/key range at scale) and reused by every subsequent batch. The
    * whole point at 100 TB: the existing corpus is NEVER re-tokenized,
    * re-hashed, or re-signed when a new batch arrives.
    */
  def minhashIndexTables(docs: DataFrame, idCol: String, textCol: String, k: Int): (DataFrame, DataFrame) = {
    val sets = shingleSets(docs, idCol, textCol, k)
    val sigs = sets.select(col(idCol), minhashSignature(col("sh")).as("sig"))
    val bands = sigs.select(
      col(idCol),
      posexplode(bandArray(col("sig"))).as(Seq("band", "key"))
    )
    (bands, sets)
  }

  /** Incremental MinHash near-dup: pairs involving at least one NEW
    * document, against an existing index. Candidate generation joins the
    * new batch's bands against (old ∪ new) bands — new×new and new×old
    * pairs surface, old×old pairs are structurally impossible (the probe
    * side is new-only), so work scales with |new batch| × collision rate,
    * not with the corpus. Verification reads shingle sets by narrow id
    * join from the union of the persisted old sets and the new ones.
    *
    * Id reuse (a document re-synced with updated text) resolves NEW-WINS:
    * the replaced id's old bands and old shingle set are dropped before
    * the union, so candidates and Jaccard values reflect only the current
    * text — without this, the verify join would fan out per stale row.
    */
  def minhashDedupIncremental(
      newDocs: DataFrame,
      oldBands: DataFrame,
      oldSets: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double
  ): DataFrame = {
    // the NEW batch's tables are consumed 2-3× each (ids / band probe /
    // set union) and were re-shingled per consumer — cache once (r18);
    // the old side stays untouched (in production it is a persisted
    // parquet index, already a leaf)
    val (newBands0, newSets0) = minhashIndexTables(newDocs, idCol, textCol, k)
    val newBands = newBands0.cache()
    val newSets = newSets0.cache()
    val newIds = newSets.select(col(idCol))
    val keptOldBands = oldBands.join(newIds, Seq(idCol), "left_anti")
    val keptOldSets = oldSets.join(newIds, Seq(idCol), "left_anti")
    val allBands = keptOldBands.union(newBands)
    val a = newBands.select(col(idCol).as("id_a"), col("band"), col("key"))
    val b = allBands.select(col(idCol).as("id_b"), col("band"), col("key"))
    val cands = a.join(b, Seq("band", "key"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"), greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    jaccardVerify(cands, keptOldSets.union(newSets), idCol, threshold)
  }

  /** The production dedup CASCADE: exact dedup first, n-gram Jaccard only
    * on the per-content representatives. On real corpora duplicate
    * multiplicity is the quadratic driver — every clone pair is both a
    * candidate and an output row of a direct similarity join — so
    * collapsing exact groups first bounds the similarity stage by the
    * DISTINCT corpus size (measured: 4× clone-heavy corpus, direct PPJoin
    * 15.2 s vs 3.4 s through the cascade, identical information). Output:
    * near-dup pairs between representatives (id_a, id_b, jaccard);
    * recover clone-level pairs by joining each side to its exact group.
    */
  def cascadeJaccard(docs: DataFrame, idCol: String, textCol: String, k: Int, tNum: Int, tDen: Int): DataFrame = {
    val reps = docs
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .join(docs, Seq(idCol))
      .select(col(idCol), col(textCol))
    ngramJaccardJoin(reps, idCol, textCol, k, tNum, tDen)
  }

  /** Duplicate-cluster resolution, transitive: connected components over
    * the near-dup pair graph by min-label propagation WITH pointer
    * jumping. Each round combines
    *   - one neighbor-hop: min label over direct neighbors (the label-
    *     propagation core of large-star/small-star CC), and
    *   - one pointer jump: label(v) ← label(label(v)) — labels are always
    *     node ids, so the label's own label exists; chasing it halves the
    *     remaining path like in Shiloach–Vishkin / pointer-jumping CC.
    * Together the rounds needed drop from the graph diameter to
    * ~log(diameter) — the difference between 60+ and ~7 shuffles on a
    * chain-shaped cluster. Both hops run in ONE join + aggregate per
    * round (the label edges v → label(v) are unioned into the edge set);
    * the driver loop only checks a converged COUNT, no data ever
    * collects; `localCheckpoint` truncates lineage per round.
    *
    * Output: (id, cluster) where cluster = min id reachable via pairs —
    * the same fixpoint as plain propagation, so oracles are unchanged.
    */
  def duplicateClusters(pairs: DataFrame): DataFrame =
    duplicateClustersWithRounds(pairs)._1

  /** [[duplicateClusters]] plus the number of rounds run (for convergence
    * tests and operational visibility).
    */
  def duplicateClustersWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(false)
    // Seed with min(self, direct neighbors) — one aggregate that saves a
    // full propagation round on shallow graphs (the common dup-cluster
    // case).
    var labels = edges
      .groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("cluster"))
      .withColumnRenamed("src", "id")
      .localCheckpoint(false)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      // Neighbor hop and pointer jump fused into ONE join: augmenting the
      // edge set with the label edges (v → label(v)) makes the same
      // min-over-destinations aggregate deliver min(neighbor labels,
      // label(label(v))) — labels are always node ids, so label(v) has a
      // labels row and the jump resolves in the join.
      val augmented = edges.union(labels.select(col("id").as("src"), col("cluster").as("dst")))
      val nbrMin = augmented
        .join(labels.select(col("id").as("dst"), col("cluster").as("nc")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("min_nbr"))
      val updated = labels
        .join(nbrMin, Seq("id"), "left_outer")
        .select(
          col("id"),
          col("cluster"),
          least(col("cluster"), coalesce(col("min_nbr"), col("cluster"))).as("new_cluster")
        )
        .localCheckpoint(false)
      changed = updated.where(col("new_cluster") < col("cluster")).count()
      labels = updated.select(col("id"), col("new_cluster").as("cluster"))
      rounds += 1
    }
    (labels, rounds)
  }

  /** Exact-substring duplicate spans (the character-level dedup of the
    * "deduplicating training data" line of work): a length-`gramLen`
    * character window occurring ≥ 2 times ANYWHERE in the corpus (across
    * documents or repeated within one) marks every position it covers as
    * duplicated. Output per document (only documents with ≥ 1 duplicated
    * window): total window count, duplicated window count, and
    * `dup_chars` — the exact length of the union of the duplicated
    * [pos, pos+gramLen) intervals, i.e. how many characters an exact-
    * substring dedup pass would cut.
    *
    * Plan shape: one generate (position windows hashed per row — no
    * shuffle), one hash-aggregate on the gram hash, one equi-join back,
    * one per-doc window over ONLY the duplicated positions (sparse), and
    * the final per-doc aggregate reuses the window's partitioning. The
    * interval union needs no interval tree: windows have constant length,
    * so sorted by position, each contributes min(gramLen, nextPos − pos)
    * covered characters (the last contributes gramLen).
    *
    * Scale posture: the position-window explode is the honest cost —
    * ~8 bytes per character of corpus shuffled once for the global count.
    * At 100 TB that is why this runs AFTER the exact/cascade passes on the
    * surviving corpus, and why `minCount` can be raised to target only
    * heavy boilerplate. The dup-gram table itself is small (only ≥2-count
    * hashes survive the aggregate).
    */
  def substringDupSpans(docs: DataFrame, idCol: String, textCol: String,
      gramLen: Int = 50, minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fused codegen window hashing (CharGramHash32): one O(n) loop per doc
    // replaces the interpreted transform→substr→md5-hex→conv chain
    // (measured ~5× at sf0.1); values stay bit-identical to
    // md5(substr(text, i+1, gramLen)) so the oracle replays them directly
    val grams = docs
      .where(length(col(textCol)) >= gramLen)
      .select(col(idCol), (length(col(textCol)) - (gramLen - 1)).cast(LongType).as("n_grams"), col(textCol))
      .select(col(idCol), col("n_grams"),
        posexplode(graft.functions.HashExpressions.charGramHash32(col(textCol), gramLen))
          .as(Seq("pos", "g")))
    // Global gram count as a TWO-PHASE hash aggregate + join-back, NOT a
    // count window over g: a window gives a single-scan plan (measured
    // ~1.4 s faster at sf0.1) but funnels every occurrence of a hot gram
    // into one task — and hot 50-grams (boilerplate) are exactly what a
    // web corpus contains, so at 100 TB the window form is a skew bomb.
    // The aggregate's map-side partial combine absorbs hot keys; the cost
    // is re-hashing the probe side (one extra narrow scan of cheap fused
    // CharGramHash32 work).
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount).select(col("g"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    grams.join(dup, "g")
      .withColumn("nxt", lead(col("pos"), 1).over(w))
      .groupBy(col(idCol), col("n_grams"))
      .agg(
        count(lit(1)).as("n_dup_grams"),
        sum(when(col("nxt").isNull, lit(gramLen.toLong))
          .otherwise(least(lit(gramLen.toLong), (col("nxt") - col("pos")).cast(LongType)))).as("dup_chars"))
  }

  /** One-pass greedy resolution: keep every doc that is never the larger
    * id of a verified near-dup pair (the "first occurrence wins" policy
    * streaming dedup uses).
    */
  def keepAfterDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("id_b").as(idCol)), Seq(idCol), "left_anti")

  /** 64-bit SimHash as two 32-bit words (keeps all arithmetic inside
    * signed-64 range): bit j of word w is set when the sum over tokens of
    * ±1 (per that token's hash bit) is positive. Token multiplicity counts
    * (term-frequency weighting).
    */
  /** One SimHash word from an already-materialized token-hash array column.
    * Static unroll over bit positions keeps every shift amount a literal
    * (Spark's shiftright takes an Int). The input must be an attribute
    * reference — 32 bit-sums each scan the array, and an inlined md5
    * expression would be recomputed 32× (measured 30s → <1s at sf0.1).
    */
  def simhashWord(hashes: Column): Column =
    (0 until 32).map { j =>
      val bitsum = aggregate(hashes, lit(0L), (a, h) => a + (shiftright(h, j) % 2L) * 2L - 1L)
      when(bitsum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SimHash near-dup pairs: band each 64-bit fingerprint into four 16-bit
    * chunks (pigeonhole: any pair within Hamming distance 3 collides on at
    * least one chunk), bucket-join, then keep pairs with Hamming ≤ maxDist.
    */
  def simhashDedup(docs: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val fps = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(
        col(idCol),
        graft.functions.HashExpressions.tokenHash32(col("toks")).as("h1"),
        graft.functions.HashExpressions.tokenHash32(col("toks"), second = true).as("h2")
      )
      .select(
        col(idCol),
        graft.functions.HashExpressions.simhashWord(col("h1")).as("w1"),
        graft.functions.HashExpressions.simhashWord(col("h2")).as("w2")
      )
    val banded = fps.select(
      col(idCol), col("w1"), col("w2"),
      posexplode(array(
        shiftright(col("w1"), 0) % 65536L, shiftright(col("w1"), 16) % 65536L,
        shiftright(col("w2"), 0) % 65536L, shiftright(col("w2"), 16) % 65536L
      )).as(Seq("band", "key"))
      // narrow (id, words, band, key): one fingerprint pass feeds both
      // self-join sides instead of each re-running the 64 bit-sums (r18).
      // cache, not localCheckpoint, deliberately: PlanSpec pins that
      // SimHashWord stays inside a whole-stage-codegen span of q43's
      // DECLARED plan, and a checkpoint would hide the fingerprint stage
      // inside an RDD leaf (measured cost of keeping it visible: ~0.06 s)
    ).cache()
    val a = banded.select(col(idCol).as("id_a"), col("w1").as("w1a"), col("w2").as("w2a"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("id_b"), col("w1").as("w1b"), col("w2").as("w2b"), col("band"), col("key"))
    a.join(b, Seq("band", "key")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("w1a").bitwiseXOR(col("w1b"))) + bit_count(col("w2a").bitwiseXOR(col("w2b")))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
