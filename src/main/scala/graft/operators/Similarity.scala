package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, mirroring a production ANN stack:
  *   - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *     Broadcast the (small) query set against the corpus: one narrow pass,
  *     no shuffle of the corpus, `TakeOrdered`-style per-query top-k.
  *   - [[ivfTopK]] — IVF (inverted-file) search: a coarse quantizer assigns
  *     every vector to its nearest centroid (the "list"); queries probe only
  *     their `nprobe` closest lists. Corpus work drops by ~|lists|/nprobe;
  *     the corpus is partitioned by list id, so at cluster scale each probe
  *     touches only matching partitions.
  *
  * All floating-point math is sequential left-to-right (`zip_with` +
  * `aggregate`), giving bit-identical results to an engine that evaluates
  * the same expression order — which the DuckDB oracles do.
  */
object Similarity {

  /** Elementwise-sequential dot product of two double arrays. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.vecDot(a, b)

  /** L2 norm, same accumulation order. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** float[] → double[] (exact upcast) so all scoring runs in doubles. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  def cosine(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Corpus prepared once: id, vector as doubles, precomputed norm. */
  def prepare(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact top-k cosine neighbors of each query vector (self excluded).
    * `queries` must be small (it is broadcast); the corpus streams through
    * unshuffled, each task pre-reduces to its local k-best per query with
    * a bounded heap (narrow `mapPartitions`), and only tasks×queries×k
    * candidate rows reach the final per-query window. Without the
    * pre-reduce, the window would shuffle |corpus|×|queries| scored rows
    * and serialize each query's ranking through one task — the difference
    * between hours and seconds at 10^9 vectors.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries.select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))),
        col("vid") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("qn"), col("v"), col("nrm")))
      .select(col("query_id"), col("vid"), col("cos"))
    topKPerKey(scored, k)
  }

  /** Exact per-key top-k of (query_id, vid, cos) rows: narrow local
    * bounded-heap pre-reduce, then a window over the surviving ≤
    * partitions×k rows per key. Ordering ties break on ascending vid, so
    * the result is identical to a global sort.
    */
  /** Hard-negative mining for contrastive training: each query's top-k
    * most-similar corpus vectors with a DIFFERENT label — the highest-loss
    * negatives. Same broadcast + bounded-heap shape as [[bruteForceTopK]];
    * the label-mismatch predicate rides the broadcast join, so the corpus
    * still streams through unshuffled. `corpus`/`queries` carry
    * (vid, v, nrm, label).
    */
  def hardNegativeTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .join(
        broadcast(queries.select(col("vid").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("label").as("qlabel"))),
        col("vid") =!= col("query_id") && col("label") =!= col("qlabel"))
      .withColumn("cos", cosine(col("qv"), col("qn"), col("v"), col("nrm")))
      .select(col("query_id"), col("vid"), col("cos"))
    topKPerKey(scored, k)
  }

  private[operators] def topKPerKey(scored: DataFrame, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    val pre = scored.as[(Long, Long, Double)].mapPartitions { it =>
      // (cos desc, vid asc) best-first ⇒ heap keeps the worst on top.
      val heapOrd = Ordering.by[(Long, Long, Double), (Double, Long)] { case (_, vid, cos) => (-cos, vid) }
      val heaps = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
      it.foreach { row =>
        val h = heaps.getOrElseUpdate(row._1, scala.collection.mutable.PriorityQueue.empty(heapOrd))
        if (h.size < k) h.enqueue(row)
        else if (heapOrd.lt(row, h.head)) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }.toDF("query_id", "vid", "cos")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vid").asc)
    pre
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Assign each corpus vector to its nearest centroid (max cosine,
    * centroid-id tiebreak). Centroids must be small (broadcast).
    *
    * The argmax is a hash AGGREGATE over a lexicographic struct max —
    * (ccos, −cid) ranks exactly like the window's (ccos DESC, cid ASC)
    * and cid uniqueness makes the comparison deterministic — instead of a
    * row_number window: partial aggregation collapses the corpus×|C|
    * scored rows map-side, so only |corpus| rows shuffle and nothing
    * sorts. (The window form shuffles AND sorts the full scored set —
    * the extra exchange the round-1 audit flagged.)
    */
  def assignLists(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vid").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    corpus
      .crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("cv"), col("cn"), col("v"), col("nrm")))
      .groupBy(col("vid"))
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"), col("v"), col("nrm"), col("cid"))).as("best"))
      .select(col("vid"), col("best.v").as("v"), col("best.nrm").as("nrm"), col("best.cid").as("cid"))
  }

  /** Multi-assignment variant: each vector lands on its `m` nearest lists.
    * Costs m× index size; recovers pairs/neighbors that single assignment
    * splits across list boundaries — the recall lever for
    * [[embeddingNearDupPairsBucketed]].
    */
  def assignListsMulti(corpus: DataFrame, centroids: DataFrame, m: Int): DataFrame = {
    val c = centroids.select(col("vid").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid").asc)
    corpus
      .crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("cv"), col("cn"), col("v"), col("nrm")))
      .withColumn("crank", row_number().over(w))
      .where(col("crank") <= m)
      .select(col("vid"), col("v"), col("nrm"), col("cid"))
  }

  /** IVF search: probe each query's `nprobe` nearest lists, exact-score
    * only the vectors in those lists, return per-query top-k.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val listed = assignLists(corpus, centroids)
    val probes = {
      val q = queries.select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = centroids.select(col("vid").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("cid").asc)
      q.crossJoin(broadcast(c))
        .withColumn("pcos", cosine(col("qv"), col("qn"), col("cv"), col("cn")))
        .withColumn("prank", row_number().over(w))
        .where(col("prank") <= nprobe)
        .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    }
    val scored = listed
      .join(broadcast(probes), Seq("cid"))
      .where(col("vid") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("qn"), col("v"), col("nrm")))
      .select(col("query_id"), col("vid"), col("cos"))
    topKPerKey(scored, k)
  }

  /** One spherical k-means refinement of an IVF coarse quantizer: assign
    * every vector to its nearest seed (cosine), then recompute each list's
    * centroid as the per-coordinate DECIMAL-exact SUM of its members —
    * cosine is scale-invariant, so the unnormalized sum serves as the mean
    * and no order-dependent float division ever happens. Fully
    * deterministic: reruns (and the DuckDB oracle) reproduce the training
    * bit-for-bit — the property that makes a trained index reproducible
    * across cluster runs.
    */
  def kmeansRefineOnce(corpus: DataFrame, seeds: DataFrame): DataFrame = {
    val dec = DecimalType(30, 15)
    val dims = assignLists(corpus, seeds)
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
    dims
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("x").cast(dec)).cast(DoubleType).as("sv"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("sv")))).as("arr"))
      .select(col("cid").as("vid"), transform(col("arr"), a => a.getField("sv")).as("v"))
      .withColumn("nrm", norm(col("v")))
      // O(lists) rows — lazily checkpointed because every downstream
      // search consumes the trained quantizer at least twice (corpus
      // assignment + query probes) and each consumption re-ran the whole
      // corpus-wide refinement and re-planned its subtree (q53's 538-line
      // declared plan; r18, guide §1.2)
      .localCheckpoint(false)
  }

  /** Random-hyperplane LSH — the second scale path next to IVF. 16
    * Rademacher (±1) hyperplanes derived deterministically from md5 of
    * "lsh:p:i" (the same portable hash arithmetic as the text pipeline),
    * so training-free, reproducible across runs/engines, and the DuckDB
    * oracle inlines the identical weights from these constants.
    */
  val LshPlaneCount = 16
  val LshEmbBands = 2 // 8 sign bits per band key

  def lshPlaneWeights(dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until LshPlaneCount).map { p =>
      (0 until dim).map { i =>
        val h = graft.functions.HashSupport.hashBytes(
          md, s"lsh:$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    }
  }

  /** Per-band bucket keys from the sign pattern of the plane dots: band b
    * packs planes [8b, 8b+8) into one small integer key. Cosine-similar
    * vectors agree on most signs, so near neighbors collide on at least
    * one whole band with high probability (banding amplifies the
    * per-plane collision probability exactly like MinHash LSH).
    */
  def lshBandKeys(v: Column, dim: Int): Seq[Column] = {
    val bits = lshPlaneWeights(dim).map(w => when(dot(v, typedlit(w)) > 0.0, 1L).otherwise(0L))
    (0 until LshEmbBands).map { b =>
      bits.slice(b * 8, b * 8 + 8).zipWithIndex
        .map { case (bit, j) => bit * (1L << j) }
        .reduce(_ + _)
    }
  }

  /** ANN via LSH banding: candidates = corpus vectors sharing at least one
    * band key with the query (equi-join on (band, key) — never all-pairs),
    * deduplicated on the narrow (query, vid) pair, then exact cosine
    * rerank to top-k. Training-free alternative to [[ivfTopK]]: no
    * centroids to fit, at the cost of less even bucket sizes.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int): DataFrame = {
    def banded(df: DataFrame, idAs: String) = df.select(
      col("vid").as(idAs),
      posexplode(array(lshBandKeys(col("v"), dim): _*)).as(Seq("band", "key"))
    )
    val cands = banded(corpus, "vid")
      .join(banded(queries, "query_id"), Seq("band", "key"))
      .where(col("vid") =!= col("query_id"))
      .select("query_id", "vid").distinct()
    val scored = cands
      .join(corpus.select(col("vid"), col("v"), col("nrm")), "vid")
      .join(queries.select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn")), "query_id")
      .withColumn("cos", cosine(col("qv"), col("qn"), col("v"), col("nrm")))
      .select(col("query_id"), col("vid"), col("cos"))
    topKPerKey(scored, k)
  }

  /** Product quantization (PQ) — the memory-compressed ANN tier next to
    * IVF and LSH. Vectors split into `M` subvectors; each subvector is
    * replaced by the id of its nearest codeword (L2), so a 64-dim float
    * vector becomes `M` small codes. At 100 TB that's the difference
    * between shuffling 8-byte code rows and 512-byte vectors; queries
    * score candidates by ADC (asymmetric distance computation): a per-
    * query distance TABLE to every codeword, then approximate distance =
    * Σ over subspaces of table[code]. All arithmetic is sequential or
    * DECIMAL-exact, so DuckDB oracles replay it bit-for-bit.
    */
  val PqSubspaces = 8

  /** Sequential L2² between two equal-length double arrays. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  private def pqSub(v: Column, m: Int, d: Int): Column = slice(v, m * d + 1, d)

  /** Encode the corpus against a (small, broadcast) codebook: one
    * crossJoin + ONE hash aggregate carrying all `M` per-subspace argmins
    * as lexicographic struct-mins (min distance, codeword-id tiebreak —
    * deterministic). Output: (vid, v, codes: array<codeword id>).
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, dim: Int): DataFrame = {
    val d = dim / PqSubspaces
    val cb = codebook.select(col("vid").as("cid"), col("v").as("cv"))
    val scored = corpus
      .crossJoin(broadcast(cb))
      .select(
        col("vid") +: col("v") +: col("cid") +:
          (0 until PqSubspaces).map(m => l2sq(pqSub(col("v"), m, d), pqSub(col("cv"), m, d)).as(s"d$m")): _*)
    scored
      .groupBy(col("vid"))
      .agg(
        first(col("v")).as("v"),
        (0 until PqSubspaces).map(m => min(struct(col(s"d$m"), col("cid"))).as(s"b$m")): _*
      )
      .select(col("vid"), col("v"),
        array((0 until PqSubspaces).map(m => col(s"b$m.cid")): _*).as("codes"))
  }

  /** ADC top-k: per-query distance tables to the codebook (broadcast),
    * joined to the exploded corpus codes on (subspace, code) — an
    * equi-join over the COMPRESSED representation — then an order-free
    * DECIMAL-exact sum per (query, vid) and a bounded top-k. Exact
    * distances never touch the corpus vectors after encoding.
    */
  def pqTopK(corpus: DataFrame, codebook: DataFrame, queries: DataFrame, k: Int, dim: Int): DataFrame = {
    val d = dim / PqSubspaces
    val encoded = pqEncode(corpus, codebook, dim)
      .select(col("vid"), posexplode(col("codes")).as(Seq("m", "code")))
    val cb = codebook.select(col("vid").as("cid"), col("v").as("cv"))
    val dtable = queries
      .select(col("vid").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cb))
      .select(
        col("query_id"), col("cid"),
        posexplode(array((0 until PqSubspaces).map(m => l2sq(pqSub(col("qv"), m, d), pqSub(col("cv"), m, d))): _*))
          .as(Seq("m", "dm")))
    // Sum the M partial distances as a SEQUENTIAL fold in subspace order —
    // not an unordered float SUM (engines would disagree at the last ulp)
    // and not a decimal cast (DuckDB's double→decimal is itself a lossy
    // double multiply). collect → sort by m → left fold is bit-identical
    // everywhere.
    val scored = encoded
      .join(broadcast(dtable), encoded("m") === dtable("m") && encoded("code") === dtable("cid"))
      .where(col("vid") =!= col("query_id"))
      .groupBy(col("query_id"), col("vid"))
      .agg(array_sort(collect_list(struct(dtable("m"), col("dm")))).as("ds"))
      .select(col("query_id"), col("vid"),
        aggregate(transform(col("ds"), x => x.getField("dm")), lit(0.0), _ + _).as("adist"))
    // reuse the bounded-heap top-k (ordering DESC): negate the distance —
    // exact for floats — and negate back on the way out
    topKPerKey(scored.select(col("query_id"), col("vid"), (-col("adist")).as("cos")), k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), (-col("cos")).as("adist"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Exact
    * all-pairs within LSH-free small corpora; at scale the same verify
    * runs after [[assignLists]] bucketing (pairs within a list).
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vid").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = corpus.select(col("vid").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Corpus-scale near-dup: pairs are only scored WITHIN an IVF list
    * (vectors assigned to the same centroid), turning the n² cross product
    * into per-list blocks — the standard blocking trade: pairs split
    * across lists are missed (bound the loss with more lists / multi-
    * assignment), everything found is exact.
    */
  def embeddingNearDupPairsBucketed(
      corpus: DataFrame,
      centroids: DataFrame,
      threshold: Double,
      m: Int = 1
  ): DataFrame = {
    // cached: both self-join sides consumed the assignment, and each side
    // re-ran the corpus×centroids scoring (cache, not checkpoint — the
    // corpus-sized-table lesson from the dedup family applies; r18)
    val listed =
      (if (m <= 1) assignLists(corpus, centroids) else assignListsMulti(corpus, centroids, m))
        .cache()
    val a = listed.select(col("cid"), col("vid").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = listed.select(col("cid"), col("vid").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cid"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .distinct() // multi-assignment can surface a pair in several lists
  }

  /** SemDeDup-style semantic prune: one verdict row per DROPPED vector —
    * any vector with a lower-id within-list neighbor above the cosine
    * threshold, together with its smallest such keeper and the strongest
    * similarity that condemned it. Keep-lowest-id is the deterministic
    * stand-in for SemDeDup's keep-medoid rule (both pick exactly one
    * survivor per near-dup relation; lowest-id needs no extra pass).
    *
    * Scale contract is the bucketed pair join's: verify work is
    * Σ |list|², not n², and the per-drop aggregate is a hash aggregate
    * over those pairs — nothing beyond the pair set ever materializes.
    */
  def semanticDedupDropped(corpus: DataFrame, centroids: DataFrame, threshold: Double): DataFrame =
    embeddingNearDupPairsBucketed(corpus, centroids, threshold)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("keeper_id"), max(col("cos")).as("max_cos"))
      .select(col("id_b").as("dropped_id"), col("keeper_id"), col("max_cos"))

  /** SEMANTIC decontamination (r9): flag TRAIN vectors whose embedding is
    * close to any TEST/benchmark vector — the embedding-level form of the
    * n-gram decontamination pass (q73/q125 catch verbatim leakage; a
    * paraphrased eval item only shows up in embedding space). Cross-set
    * variant of the bucketed near-dup join: both sides assign to their
    * `m` nearest centroids, candidates are co-bucketed (train, test)
    * pairs — Σ |train bucket|·|test bucket| work, never |train|·|test| —
    * and one hash aggregate per condemned train vector emits the
    * evidence (hit count + strongest condemning similarity). At 100 TB
    * the test side is tiny (an eval suite) and broadcasts; the train
    * side streams through its buckets once.
    */
  def semanticContamination(corpus: DataFrame, centroids: DataFrame,
      isTest: Column, threshold: Double, m: Int = 1): DataFrame = {
    val listed =
      (if (m <= 1) assignLists(corpus, centroids) else assignListsMulti(corpus, centroids, m))
        .withColumn("is_test", isTest)
        .cache() // train and test sides both read the assignment (r18)
    val train = listed.where(!col("is_test"))
      .select(col("cid"), col("vid").as("train_id"), col("v").as("va"), col("nrm").as("na"))
    val test = listed.where(col("is_test"))
      .select(col("cid"), col("vid").as("test_id"), col("v").as("vb"), col("nrm").as("nb"))
    train.join(test, Seq("cid"))
      .withColumn("cos", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .where(col("cos") > threshold)
      .groupBy(col("train_id"))
      // multi-assignment can surface a (train, test) pair in several
      // buckets: count DISTINCT condemning test vectors; max is
      // duplicate-insensitive
      .agg(countDistinct(col("test_id")).as("n_hits"), max(col("cos")).as("max_cos"))
  }
}
