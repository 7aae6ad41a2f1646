package graft.queries

import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Deduplication capability surface over the `documents` (and `embeddings`)
  * tables: exact, exact n-gram Jaccard (prefix-filtered), MinHash+LSH,
  * SimHash, embedding-cosine. Spark side in [[graft.operators.Dedup]] /
  * [[graft.operators.Similarity]]; each oracle replays the *identical*
  * md5-derived hash arithmetic in DuckDB SQL (generated below from the same
  * Scala constants, so they can never drift).
  */
object DedupQueries {

  private val P = TextFunctions.HashPrime

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** DuckDB CTEs: documents → distinct k-shingle hash sets `hh(doc_id, h)`
    * plus exploded `ds(doc_id, sh)` and sizes `sz(doc_id, n)`. `docsFrom`
    * parameterizes the corpus source (q65 restricts it to exact-dedup
    * representatives).
    */
  private def shingleCtes(k: Int, docsFrom: String = "documents"): String = {
    val gram = (1 to k).map(i => s"t[j+$i]").mkString("||' '||")
    s"""d AS (SELECT doc_id, string_split(text,' ') t FROM $docsFrom),
       |sh0 AS (SELECT doc_id, list_transform(range(0, len(t)-${k - 1}), j -> $gram) s FROM d),
       |hh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P)) h
       |       FROM sh0 WHERE len(s) > 0),
       |ds AS (SELECT doc_id, unnest(h) sh FROM hh),
       |sz AS (SELECT doc_id, len(h) n FROM hh)""".stripMargin
  }

  /** The full-PPJoin candidate CTEs (frequency-ordered asymmetric
    * prefixes, length + accumulated positional filters) over the
    * `ds`-form shingle sets, ending in `cand(id_a, id_b)` — the single
    * source both q41 and q65 replay (see
    * [[graft.operators.Dedup.ngramJaccardJoin]] for the Spark side and
    * the lemma documentation).
    */
  private def ppjoinCtes(tN: Int, tD: Int): String = {
    val probeLen = s"(n - ((n*$tN + $tD - 1) // $tD) + 1)::BIGINT"
    val indexLen = s"(n - ((2*n*$tN + $tD + $tN - 1) // (${tD + tN})) + 1)::BIGINT"
    val minOverlap = s"((na + nb)*$tN + ${tD + tN} - 1) // ${tD + tN}"
    s"""dfreq AS (SELECT sh, count(*) df FROM ds GROUP BY 1),
       |srt AS (SELECT d.doc_id, list(d.sh ORDER BY f.df, d.sh) h, count(*) n
       |        FROM ds d JOIN dfreq f USING (sh) GROUP BY d.doc_id),
       |probe AS (SELECT doc_id, n,
       |          generate_subscripts(list_slice(h, 1, $probeLen), 1) - 1 pos,
       |          unnest(list_slice(h, 1, $probeLen)) sh FROM srt),
       |idx AS (SELECT doc_id, n,
       |        generate_subscripts(list_slice(h, 1, $indexLen), 1) - 1 pos,
       |        unnest(list_slice(h, 1, $indexLen)) sh FROM srt),
       |coll AS (SELECT least(a.doc_id, b.doc_id) id_a, greatest(a.doc_id, b.doc_id) id_b,
       |                a.n na, b.n nb, count(*) c, max(a.pos) mpa, max(b.pos) mpb
       |         FROM probe a JOIN idx b ON a.sh = b.sh
       |           AND (a.n > b.n OR (a.n = b.n AND a.doc_id < b.doc_id))
       |           AND b.n * $tD >= a.n * $tN
       |         GROUP BY 1, 2, 3, 4),
       |cand AS (SELECT id_a, id_b FROM coll
       |         WHERE c + least(na - 1 - mpa, nb - 1 - mpb) >= $minOverlap)""".stripMargin
  }

  /** DuckDB jaccard-verify CTEs over candidate pairs CTE `cand(id_a,
    * id_b)`, ending in `verified(id_a, id_b, jaccard)`.
    */
  private def jaccardCtes(threshold: String): String =
    s"""inter AS (SELECT c.id_a, c.id_b, count(*) i FROM cand c
       |  JOIN ds x ON x.doc_id = c.id_a JOIN ds y ON y.doc_id = c.id_b AND y.sh = x.sh
       |  GROUP BY 1, 2),
       |jac AS (SELECT id_a, id_b, i::DOUBLE / (sx.n + sy.n - i)::DOUBLE jaccard FROM inter
       |  JOIN sz sx ON sx.doc_id = id_a JOIN sz sy ON sy.doc_id = id_b),
       |verified AS (SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= $threshold)""".stripMargin

  private def jaccardSql(threshold: String): String =
    s"""${jaccardCtes(threshold)}
       |SELECT id_a, id_b, jaccard FROM verified""".stripMargin

  /** MinHash signature + LSH banding CTEs ending in `banded(doc_id, band,
    * bkey)` — shared by the full pipeline (q42) and the incremental
    * variant (q90), which differ only in candidate generation.
    */
  private def minhashBandCtes: String = {
    val sigCols = Dedup.MinhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"list_aggregate(list_transform(h, v -> (v*$a+$b)%$P), 'min') s$i"
    }.mkString(", ")
    val bandSelects = (0 until Dedup.LshBands).map { bnd =>
      val key = (0 until Dedup.LshRows).map(r => s"s${bnd * Dedup.LshRows + r}::VARCHAR").mkString("||','||")
      s"SELECT doc_id, $bnd band, $key bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""${shingleCtes(3)},
       |sig AS (SELECT doc_id, $sigCols FROM hh),
       |banded AS ($bandSelects)""".stripMargin
  }

  /** The full MinHash+LSH pipeline CTEs ending in `verified`. */
  private def minhashCtes: String =
    s"""$minhashBandCtes,
       |cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b FROM banded a
       |         JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |${jaccardCtes("0.5")}""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── Exact dedup: one hash-aggregate on the content digest; keeper =
    //    min id per group. The always-first, always-cheapest pass.
    QueryDef(
      "q40_dedup_exact",
      (s, d) => Dedup.exactDuplicates(docs(s, d), "doc_id", "text"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
        FROM documents GROUP BY 1""")
    ),

    // ── Exact n-gram Jaccard join, full PPJoin: frequency-ordered sets
    //    (rarest shingles in the prefix), asymmetric probe/index prefixes,
    //    length filter, accumulated positional filter, then exact verify
    //    ≥ 0.5. The oracle replays every stage, including the (df, h)
    //    ordering and both integer prefix-length formulas.
    QueryDef(
      "q41_dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardJoin(docs(s, d), "doc_id", "text", k = 3, tNum = 1, tDen = 2),
      Some(s"""WITH ${shingleCtes(3)},
        ${ppjoinCtes(1, 2)},
        ${jaccardSql("(1.0/2.0)")}""")
    ),

    // ── The production dedup cascade: exact dedup first, PPJoin Jaccard
    //    only on the per-content representatives — duplicate multiplicity
    //    is the quadratic driver of any direct similarity join (clone
    //    pairs are both candidates and output), so the similarity stage is
    //    bounded by the DISTINCT corpus size.
    QueryDef(
      "q65_dedup_cascade",
      (s, d) => Dedup.cascadeJaccard(docs(s, d), "doc_id", "text", k = 3, tNum = 1, tDen = 2),
      Some(s"""WITH ${shingleCtes(3,
          "documents WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))")},
        ${ppjoinCtes(1, 2)},
        ${jaccardSql("(1.0/2.0)")}""")
    ),

    // ── Normalization-aware exact dedup: case-folded, punctuation-
    //    stripped, whitespace-collapsed canonical form hashed per doc —
    //    catches trivially-reformatted duplicates that byte-exact q40
    //    misses, still one hash-aggregate. The canonicalization is pure
    //    string functions, replayed identically by the oracle.
    QueryDef(
      "q75_dedup_normalized",
      (s, d) => {
        // Fused single-pass canonicalization (CanonAlnum) — identical
        // semantics to the trim/regexp_replace/lower chain the oracle
        // replays, without two regex scans per document (CanonSpec pins
        // the equivalence property-based).
        val canon = graft.functions.CanonicalizeExpressions.canonAlnum(col("text"))
        docs(s, d)
          .groupBy(md5(canon).as("canon_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      },
      Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_hash,
          min(doc_id) AS keep_id, count(*) AS n_dups
        FROM documents GROUP BY 1""")
    ),

    // ── Containment (near-superset) pairs: |A∩B|/|A| ≥ 0.9 — the
    //    asymmetric relative of Jaccard that catches excerpts/quotes whose
    //    size ratio pushes symmetric similarity below any workable
    //    threshold. Candidates from shared rare shingles (df ≤ 50
    //    stop-guard); exact verify on candidates only.
    QueryDef(
      "q89_dedup_containment",
      (s, d) => Dedup.containmentJoin(docs(s, d), "doc_id", "text", k = 3,
        threshold = 0.9, maxDf = 50),
      Some(s"""WITH ${shingleCtes(3)},
        rare AS (SELECT doc_id, sh FROM ds
                 WHERE sh IN (SELECT sh FROM ds GROUP BY sh HAVING count(*) <= 50)),
        cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
                 FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        inter AS (SELECT c.id_a, c.id_b, count(*) i,
                    any_value(sx.n) na, any_value(sy.n) nb
                  FROM cand c
                  JOIN ds x ON x.doc_id = c.id_a
                  JOIN ds y ON y.doc_id = c.id_b AND y.sh = x.sh
                  JOIN sz sx ON sx.doc_id = c.id_a
                  JOIN sz sy ON sy.doc_id = c.id_b
                  GROUP BY 1, 2)
        SELECT id_a, id_b, i::DOUBLE / na::DOUBLE AS containment
        FROM inter WHERE i::DOUBLE / na::DOUBLE >= 0.9
        UNION ALL
        SELECT id_b, id_a, i::DOUBLE / nb::DOUBLE
        FROM inter WHERE i::DOUBLE / nb::DOUBLE >= 0.9""")
    ),

    // ── MinHash + LSH banding: 16 affine min-hashes, 4 bands × 4 rows,
    //    bucket-join on whole-band collision, exact-Jaccard verify ≥ 0.5.
    QueryDef(
      "q42_dedup_minhash_lsh",
      (s, d) => Dedup.minhashDedup(docs(s, d), "doc_id", "text", k = 3, threshold = 0.5),
      Some(s"""WITH $minhashCtes
        SELECT id_a, id_b, jaccard FROM verified""")
    ),

    // ── Incremental MinHash dedup as a first-class declared query: the
    //    20% of docs with doc_id % 5 = 0 arrive as the NEW batch and are
    //    deduped against the persisted band/set index of the other 80% —
    //    the probe side is new-only, so old×old pairs are structurally
    //    impossible and work scales with the batch, not the corpus. The
    //    oracle restricts candidate generation to new-doc probes over the
    //    same banding.
    QueryDef(
      "q90_dedup_incremental",
      (s, d) => {
        val all = docs(s, d)
        val oldDocs = all.where(pmod(col("doc_id"), lit(5)) =!= 0)
        val newDocs = all.where(pmod(col("doc_id"), lit(5)) === 0)
        val (oldBands, oldSets) = Dedup.minhashIndexTables(oldDocs, "doc_id", "text", 3)
        Dedup.minhashDedupIncremental(newDocs, oldBands, oldSets,
          "doc_id", "text", k = 3, threshold = 0.5)
      },
      Some(s"""WITH $minhashBandCtes,
        cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) id_a, greatest(a.doc_id, b.doc_id) id_b
                 FROM banded a JOIN banded b
                   ON a.band = b.band AND a.bkey = b.bkey
                   AND a.doc_id <> b.doc_id AND a.doc_id % 5 = 0),
        ${jaccardCtes("0.5")}
        SELECT id_a, id_b, jaccard FROM verified""")
    ),

    // ── Dedup resolution, greedy: keep every doc never marked as the
    //    larger id of a verified near-dup pair.
    QueryDef(
      "q45_dedup_resolution",
      (s, d) => Dedup.keepAfterDedup(
        docs(s, d).select(col("doc_id")), "doc_id",
        Dedup.minhashDedup(docs(s, d), "doc_id", "text", k = 3, threshold = 0.5)),
      Some(s"""WITH $minhashCtes
        SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id_b FROM verified)""")
    ),

    // ── Dedup resolution, transitive: connected components over the
    //    near-dup graph (min-label propagation; the oracle replays it as a
    //    recursive transitive closure).
    QueryDef(
      "q46_dedup_clusters",
      (s, d) => Dedup.duplicateClusters(
        Dedup.minhashDedup(docs(s, d), "doc_id", "text", k = 3, threshold = 0.5)),
      Some(s"""WITH RECURSIVE $minhashCtes,
        edges AS (SELECT id_a a, id_b b FROM verified UNION ALL SELECT id_b, id_a FROM verified),
        nodes AS (SELECT DISTINCT a n FROM edges),
        reach(n, r) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r)
        SELECT n AS id, min(r) AS cluster FROM reach GROUP BY n""")
    ),

    // ── SimHash: 64-bit fingerprint (two 32-bit words), 16-bit banding for
    //    candidates, Hamming ≤ 8 verify.
    QueryDef(
      "q43_dedup_simhash",
      (s, d) => Dedup.simhashDedup(docs(s, d), "doc_id", "text", maxDist = 8),
      Some {
        def word(hcol: String) =
          s"CAST(list_sum(list_transform(range(0,32), j -> CASE WHEN CAST(list_sum(list_transform($hcol, v -> ((v >> j) & 1)*2 - 1)) AS BIGINT) > 0 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT)"
        val bandSelects = (0 until 4).map { bnd =>
          val w = if (bnd < 2) "w1" else "w2"
          val sh = (bnd % 2) * 16
          s"SELECT doc_id, w1, w2, $bnd band, (($w >> $sh) & 65535) bkey FROM w"
        }.mkString(" UNION ALL ")
        s"""WITH d AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        h AS (SELECT doc_id,
          list_transform(t, x -> ('0x'||substr(md5(x),1,8))::BIGINT) h1,
          list_transform(t, x -> ('0x'||substr(md5(x),9,8))::BIGINT) h2 FROM d),
        w AS (SELECT doc_id, ${word("h1")} w1, ${word("h2")} w2 FROM h),
        banded AS ($bandSelects),
        cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b,
                 bit_count(xor(a.w1, b.w1)) + bit_count(xor(a.w2, b.w2)) hamming
                 FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 8"""
      }
    ),

    // ── Cross-modal ensemble dedup: a pair is a duplicate only when BOTH
    //    the text evidence (MinHash-verified Jaccard ≥ 0.5) AND the
    //    embedding evidence (cosine > 0.2 on the id-joined vectors) agree —
    //    the precision-over-recall fusion a production pipeline runs before
    //    destructive deduplication.
    QueryDef(
      "q56_dedup_ensemble",
      (s, d) => {
        val textPairs = Dedup.minhashDedup(docs(s, d), "doc_id", "text", k = 3, threshold = 0.5)
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        val a = corpus.select(col("vid").as("id_a"), col("v").as("va"), col("nrm").as("na"))
        val b = corpus.select(col("vid").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
        textPairs
          .join(a, "id_a")
          .join(b, "id_b")
          .withColumn("cos", Similarity.cosine(col("va"), col("na"), col("vb"), col("nb")))
          .where(col("cos") > 0.2)
          .select(col("id_a"), col("id_b"), col("jaccard"), col("cos"))
      },
      Some(s"""WITH $minhashCtes,
        e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        nn AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, v), (a,b) -> a + b*b)) nrm FROM e),
        fused AS (SELECT p.id_a, p.id_b, p.jaccard,
          list_reduce(list_prepend(0.0, list_transform(range(1, len(x.v)+1), i -> x.v[i]*y.v[i])), (a,b) -> a+b) / (x.nrm*y.nrm) cos
          FROM verified p JOIN nn x ON x.vec_id = p.id_a JOIN nn y ON y.vec_id = p.id_b)
        SELECT id_a, id_b, jaccard, cos FROM fused WHERE cos > 0.2""")
    ),

    // ── Embedding-cosine near-dup pairs, IVF-bucketed (the 100 TB path):
    //    vectors multi-assigned (m=2) to their nearest coarse lists, pairs
    //    scored only WITHIN a list — every join is an equi-join on the list
    //    id, never an all-pairs non-equi join. The oracle replays the same
    //    assignment, so recall semantics are pinned; the exact all-pairs
    //    variant stays as the spec-side recall baseline (DedupSpec).
    QueryDef(
      "q44_dedup_embedding",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.embeddingNearDupPairsBucketed(
          corpus, centroids = corpus.where(col("vid") < 16), threshold = 0.4, m = 2)
      },
      Some {
        def dotSql(a: String, b: String) =
          s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (x,y) -> x+y)"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, v), (a,b) -> a + b*b)) nrm FROM e),
        c AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 16),
        assigned AS (SELECT vec_id, v, nrm, cid FROM (
          SELECT n.vec_id, n.v, n.nrm, c.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("cv", "v")} / (cn*nrm) DESC, c.cid ASC) crank
          FROM n CROSS JOIN c) WHERE crank <= 2),
        p AS (SELECT a.vec_id id_a, b.vec_id id_b,
          ${dotSql("a.v", "b.v")} / (a.nrm*b.nrm) cos
          FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id)
        SELECT DISTINCT id_a, id_b, cos FROM p WHERE cos > 0.4"""
      }
    ),

    // ── SEMANTIC decontamination (r9): train vectors condemned by any
    //    co-bucketed TEST vector above cosine 0.4 — the embedding-level
    //    decontamination pass (q73/q125 catch verbatim n-gram leakage;
    //    paraphrased eval items only show up here). Test set = the
    //    deterministic vec_id % 10 == 0 slice; same IVF bucketing as q44
    //    (m=2 nearest of 16 anchor centroids), so candidate work is
    //    per-bucket cross products, never |train|x|test|. Evidence per
    //    condemned train doc: distinct condemning test docs + strongest
    //    similarity (order-independent aggregates of per-pair IEEE
    //    doubles — the cross-engine-deterministic form q44 established).
    QueryDef(
      "q204_semantic_decontam",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.semanticContamination(
          corpus, centroids = corpus.where(col("vid") < 16),
          isTest = col("vid") % 10 === 0, threshold = 0.4, m = 2)
      },
      Some {
        def dotSql(a: String, b: String) =
          s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (x,y) -> x+y)"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, v), (a,b) -> a + b*b)) nrm FROM e),
        c AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 16),
        assigned AS (SELECT vec_id, v, nrm, cid FROM (
          SELECT n.vec_id, n.v, n.nrm, c.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("cv", "v")} / (cn*nrm) DESC, c.cid ASC) crank
          FROM n CROSS JOIN c) WHERE crank <= 2),
        p AS (SELECT tr.vec_id train_id, te.vec_id test_id,
          ${dotSql("tr.v", "te.v")} / (tr.nrm*te.nrm) cos
          FROM assigned tr JOIN assigned te ON tr.cid = te.cid
          WHERE tr.vec_id % 10 <> 0 AND te.vec_id % 10 = 0)
        SELECT train_id, count(DISTINCT test_id)::BIGINT n_hits, max(cos) max_cos
        FROM p WHERE cos > 0.4 GROUP BY 1"""
      }
    ),

    // ── Exact-substring duplicate spans: any 50-char window occurring ≥ 2
    //    times in the corpus marks the characters it covers; per doc,
    //    dup_chars = exact union length of the duplicated intervals (what
    //    a character-level exact dedup pass would cut). One generate + one
    //    gram-hash aggregate + a sparse per-doc window — the interval
    //    union is closed-form because windows have constant length
    //    (min(50, nextPos − pos) per sorted position).
    QueryDef(
      "q92_dedup_substring",
      // fanOut BEFORE the gram explode: unlike the PPJoin/containment
      // entries (where fanOut measured slower — their expensive verify
      // already runs post-shuffle), q92's dominant CPU is the per-char
      // CharGramHash32 explode itself, which otherwise runs inside the
      // single-task one-row-group corpus scan (r18, guide §2.6)
      (s, d) => Dedup.substringDupSpans(Tables.fanOut(docs(s, d)), "doc_id", "text", gramLen = 50),
      Some("""WITH d AS (SELECT doc_id, text, (length(text) - 49)::BIGINT n_grams
            FROM documents WHERE length(text) >= 50),
        g AS (SELECT doc_id, n_grams, i pos,
                ('0x'||substr(md5(substr(text, (i+1)::INT, 50)),1,8))::BIGINT g
              FROM (SELECT doc_id, text, n_grams, unnest(range(0, n_grams)) i FROM d)),
        dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        dp AS (SELECT doc_id, n_grams, pos,
                 lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) nxt
               FROM g WHERE g IN (SELECT g FROM dup))
        SELECT doc_id, n_grams, count(*)::BIGINT AS n_dup_grams,
          CAST(sum(CASE WHEN nxt IS NULL THEN 50 ELSE least(50, nxt - pos) END) AS BIGINT) AS dup_chars
        FROM dp GROUP BY 1, 2""")
    ),

    // ── Semantic dedup (SemDeDup shape): cluster the embedding space with
    //    the IVF coarse lists, score pairs only within a list, and emit one
    //    verdict row per PRUNED vector: its smallest lower-id keeper and
    //    the strongest similarity that condemned it. Single assignment
    //    (m=1) — SemDeDup prunes within ONE cluster per point; the per-drop
    //    reduction is a hash aggregate over the within-list pairs.
    QueryDef(
      "q101_dedup_semantic",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.semanticDedupDropped(
          corpus, centroids = corpus.where(col("vid") < 16), threshold = 0.4)
      },
      Some {
        def dotSql(a: String, b: String) =
          s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (x,y) -> x+y)"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, v), (a,b) -> a + b*b)) nrm FROM e),
        c AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 16),
        assigned AS (SELECT vec_id, v, nrm, cid FROM (
          SELECT n.vec_id, n.v, n.nrm, c.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("cv", "v")} / (cn*nrm) DESC, c.cid ASC) crank
          FROM n CROSS JOIN c) WHERE crank = 1),
        p AS (SELECT a.vec_id id_a, b.vec_id id_b,
          ${dotSql("a.v", "b.v")} / (a.nrm*b.nrm) cos
          FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id)
        SELECT id_b AS dropped_id, min(id_a) AS keeper_id, max(cos) AS max_cos
        FROM p WHERE cos > 0.4 GROUP BY id_b"""
      }
    )
  )
}
