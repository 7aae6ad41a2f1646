package graft.queries

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor capability surface over `embeddings`:
  * exact brute-force cosine top-k (the baseline) and IVF probe search (the
  * scale path). Spark side in [[graft.operators.Similarity]]; oracles
  * replay the identical sequential float arithmetic so scores are
  * bit-exact across engines.
  */
object SimilarityQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** Shared oracle CTE: embeddings as doubles with sequential L2 norms. */
  private val NormCte =
    """e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, v), (a,b) -> a + b*b)) nrm FROM e)""".stripMargin

  /** Sequential dot product a·b in DuckDB matching Spark's zip_with +
    * aggregate order (a's elements on the left of each product).
    */
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (x,y) -> x+y)"

  val defs: Seq[QueryDef] = Seq(

    // ── Exact ANN baseline: top-5 cosine neighbors for the 8 probe
    //    vectors. Broadcast the probe set; the corpus never shuffles.
    QueryDef(
      "q50_ann_bruteforce",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.bruteForceTopK(corpus, corpus.where(col("vid") < 8), k = 5)
      },
      Some(s"""WITH $NormCte,
        q AS (SELECT vec_id query_id, v qv, nrm qn FROM n WHERE vec_id < 8),
        s AS (SELECT query_id, vec_id neighbor_id, ${dotSql("qv", "v")} / (qn*nrm) cos
              FROM q JOIN n ON vec_id <> query_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
        WHERE rank <= 5""")
    ),

    // ── IVF search: 16 coarse centroids (vectors 0..15), every vector
    //    assigned to its nearest list, queries probe their 2 closest lists
    //    and exact-score only those lists' members.
    QueryDef(
      "q51_ann_ivf",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.ivfTopK(
          corpus,
          centroids = corpus.where(col("vid") < 16),
          queries = corpus.where(col("vid") < 8),
          k = 5,
          nprobe = 2
        )
      },
      Some(s"""WITH $NormCte,
        c AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 16),
        assigned AS (SELECT vec_id, v, nrm, cid FROM (
          SELECT n.vec_id, n.v, n.nrm, c.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("cv", "v")} / (cn*nrm) DESC, c.cid ASC) crank
          FROM n CROSS JOIN c) WHERE crank = 1),
        q AS (SELECT vec_id query_id, v qv, nrm qn FROM n WHERE vec_id < 8),
        probes AS (SELECT query_id, qv, qn, cid FROM (
          SELECT q.query_id, q.qv, q.qn, c.cid,
            row_number() OVER (PARTITION BY q.query_id ORDER BY ${dotSql("qv", "cv")} / (qn*cn) DESC, c.cid ASC) prank
          FROM q CROSS JOIN c) WHERE prank <= 2),
        s AS (SELECT query_id, a.vec_id neighbor_id, ${dotSql("qv", "v")} / (qn*nrm) cos
              FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
        WHERE rank <= 5""")
    ),

    // ── IVF with a TRAINED quantizer: one spherical k-means refinement of
    //    the 16 seeds (decimal-exact centroid sums — reproducible training),
    //    then the same nprobe=2 search. The oracle replays assignment,
    //    refinement, and search.
    QueryDef(
      "q53_ann_ivf_kmeans",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        val refined = Similarity.kmeansRefineOnce(corpus, corpus.where(col("vid") < 16))
        Similarity.ivfTopK(corpus, refined, corpus.where(col("vid") < 8), k = 5, nprobe = 2)
      },
      Some(s"""WITH $NormCte,
        seeds AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 16),
        seeded AS (SELECT vec_id, v, nrm, cid FROM (
          SELECT n.vec_id, n.v, n.nrm, s.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("cv", "v")} / (cn*nrm) DESC, s.cid ASC) crank
          FROM n CROSS JOIN seeds s) WHERE crank = 1),
        dims AS (SELECT cid, i - 1 pos, v[i] x FROM seeded CROSS JOIN (SELECT unnest(range(1, 65)) i)),
        sums AS (SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) sv
                 FROM dims GROUP BY cid, pos),
        cent AS (SELECT cid, list(sv ORDER BY pos) cv FROM sums GROUP BY cid),
        c AS (SELECT cid, cv, sqrt(list_reduce(list_prepend(0.0, cv), (a,b) -> a + b*b)) cn FROM cent),
        assigned AS (SELECT vec_id, v, nrm, cid FROM (
          SELECT n.vec_id, n.v, n.nrm, c.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("cv", "v")} / (cn*nrm) DESC, c.cid ASC) crank
          FROM n CROSS JOIN c) WHERE crank = 1),
        q AS (SELECT vec_id query_id, v qv, nrm qn FROM n WHERE vec_id < 8),
        probes AS (SELECT query_id, qv, qn, cid FROM (
          SELECT q.query_id, q.qv, q.qn, c.cid,
            row_number() OVER (PARTITION BY q.query_id ORDER BY ${dotSql("qv", "cv")} / (qn*cn) DESC, c.cid ASC) prank
          FROM q CROSS JOIN c) WHERE prank <= 2),
        s AS (SELECT query_id, a.vec_id neighbor_id, ${dotSql("qv", "v")} / (qn*nrm) cos
              FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
        WHERE rank <= 5""")
    ),

    // ── LSH-bucketed ANN — the training-free scale path next to IVF:
    //    16 deterministic Rademacher hyperplanes (md5-derived, inlined
    //    into the oracle from the same Scala constants), sign bits packed
    //    into 2×8-bit band keys, candidates by (band, key) equi-join,
    //    exact cosine rerank to top-5.
    QueryDef(
      "q62_ann_lsh",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.lshTopK(corpus, corpus.where(col("vid") < 8), k = 5, dim = 64)
      },
      Some {
        val planes = Similarity.lshPlaneWeights(64)
        def wLit(w: Seq[Double]) = w.map(x => if (x > 0) "1.0" else "-1.0").mkString("([", ", ", "])")
        val sigCols = planes.zipWithIndex.map { case (w, p) =>
          s"CASE WHEN ${dotSql("v", wLit(w))} > 0.0 THEN 1 ELSE 0 END s$p"
        }.mkString(",\n          ")
        def keyExpr(b: Int) =
          (0 until 8).map(j => s"s${b * 8 + j} * ${1L << j}").mkString(" + ")
        s"""WITH $NormCte,
        sig AS (SELECT vec_id, $sigCols FROM n),
        keys AS (SELECT vec_id, ${keyExpr(0)} k0, ${keyExpr(1)} k1 FROM sig),
        banded AS (SELECT vec_id, 0 band, k0 bkey FROM keys
                   UNION ALL SELECT vec_id, 1, k1 FROM keys),
        cand AS (SELECT DISTINCT c.vec_id, qb.vec_id query_id
                 FROM banded c JOIN banded qb
                   ON c.band = qb.band AND c.bkey = qb.bkey
                  AND qb.vec_id < 8 AND c.vec_id <> qb.vec_id),
        q AS (SELECT vec_id query_id, v qv, nrm qn FROM n WHERE vec_id < 8),
        s AS (SELECT cand.query_id, cand.vec_id neighbor_id, ${dotSql("qv", "v")} / (qn*nrm) cos
              FROM cand JOIN n ON n.vec_id = cand.vec_id
                        JOIN q ON q.query_id = cand.query_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
        WHERE rank <= 5"""
      }
    ),

    // ── Product-quantization ANN — the memory-compressed tier: vectors
    //    become 8 codeword ids (sub-L2 argmin vs a 16-entry codebook),
    //    queries score candidates through per-query distance tables joined
    //    on (subspace, code) — the search never touches corpus vectors
    //    after encoding. DECIMAL-exact ADC sum keeps it oracle-checkable.
    QueryDef(
      "q66_ann_pq",
      (s, d) => {
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        Similarity.pqTopK(
          corpus,
          codebook = corpus.where(col("vid") < 16),
          queries = corpus.where(col("vid") < 8),
          k = 5, dim = 64)
      },
      Some {
        val M = Similarity.PqSubspaces
        def dSql(a: String, b: String, m: Int) = {
          val (s0, e0) = (m * 8 + 1, m * 8 + 8)
          s"""list_reduce(list_prepend(0.0, list_transform(range(1, 9),
             | i -> (list_slice($a, $s0, $e0)[i] - list_slice($b, $s0, $e0)[i])
             |    * (list_slice($a, $s0, $e0)[i] - list_slice($b, $s0, $e0)[i]))), (x,y) -> x+y)""".stripMargin
        }
        val encCols = (0 until M).map(m => s"${dSql("e.v", "cb.cv", m)} d$m").mkString(",\n          ")
        val cm = (0 until M).map { m =>
          s"""c$m AS (SELECT vec_id, cid FROM (
             |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d$m, cid) rn FROM enc) WHERE rn = 1)""".stripMargin
        }.mkString(",\n        ")
        val ecodes = (0 until M).map(m => s"SELECT vec_id, $m m, c$m.cid code FROM c$m").mkString(" UNION ALL ")
        val dtCols = (0 until M).map(m => s"${dSql("q.qv", "cb.cv", m)} qd$m").mkString(",\n          ")
        val edt = (0 until M).map(m => s"SELECT query_id, cid, $m m, qd$m dm FROM dt").mkString(" UNION ALL ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        cb AS (SELECT vec_id cid, v cv FROM e WHERE vec_id < 16),
        enc AS (SELECT e.vec_id, cb.cid,
          $encCols
          FROM e CROSS JOIN cb),
        $cm,
        ecodes AS ($ecodes),
        q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 8),
        dt AS (SELECT query_id, cid,
          $dtCols
          FROM q CROSS JOIN cb),
        edt AS ($edt),
        adc AS (SELECT d.query_id, c.vec_id,
                  list_reduce(list_prepend(0.0, list(d.dm ORDER BY d.m)), (x,y) -> x+y) adist
                FROM ecodes c JOIN edt d ON d.m = c.m AND d.cid = c.code
                WHERE c.vec_id <> d.query_id GROUP BY 1, 2)
        SELECT query_id, vec_id AS neighbor_id, rank, adist FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) rank FROM adc)
        WHERE rank <= 5"""
      }
    ),

    // ── Hard-negative mining: each probe's top-3 most-similar vectors
    //    with a DIFFERENT label — the contrastive-training batch
    //    construction pass. The label-mismatch predicate rides the
    //    broadcast join; corpus still streams unshuffled through the
    //    bounded-heap pre-reduce.
    QueryDef(
      "q86_hard_negatives",
      (s, d) => {
        val lab = emb(s, d).select(col("vec_id").as("vid"), col("label"))
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding").join(lab, "vid")
        Similarity.hardNegativeTopK(corpus, corpus.where(col("vid") < 8), k = 3)
      },
      Some(s"""WITH $NormCte,
        nl AS (SELECT n.vec_id, v, nrm, label FROM n JOIN embeddings e2 ON e2.vec_id = n.vec_id),
        q AS (SELECT vec_id query_id, v qv, nrm qn, label ql FROM nl WHERE vec_id < 8),
        s AS (SELECT query_id, nl.vec_id neighbor_id, ${dotSql("qv", "v")} / (qn*nrm) cos
              FROM q JOIN nl ON nl.vec_id <> query_id AND nl.label <> ql)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
        WHERE rank <= 3""")
    ),

    // ── k-NN classification on top of the exact search: majority label
    //    vote among the 5 nearest neighbors, min-label tiebreak — the
    //    similarity-search application shape (labeling by retrieval).
    QueryDef(
      "q52_knn_classify",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val corpus = Similarity.prepare(emb(s, d), "vec_id", "embedding")
        val bf = Similarity.bruteForceTopK(corpus, corpus.where(col("vid") < 8), k = 5)
        val labels = emb(s, d).select(col("vec_id"), col("label"))
        val w = Window.partitionBy(col("query_id")).orderBy(col("votes").desc, col("pred_label").asc)
        bf.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
          .groupBy(col("query_id"), col("label").as("pred_label"))
          .agg(count(lit(1)).as("votes"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .join(labels.select(col("vec_id").as("query_id"), col("label").as("true_label")), "query_id")
          .select(col("query_id"), col("pred_label"), col("votes"), col("true_label"),
            (col("pred_label") === col("true_label")).as("correct"))
      },
      Some(s"""WITH $NormCte,
        q AS (SELECT vec_id query_id, v qv, nrm qn FROM n WHERE vec_id < 8),
        s AS (SELECT query_id, vec_id neighbor_id, ${dotSql("qv", "v")} / (qn*nrm) cos
              FROM q JOIN n ON vec_id <> query_id),
        topk AS (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
          WHERE rank <= 5),
        votes AS (SELECT t.query_id, e.label pred_label, count(*) votes
          FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
          GROUP BY 1, 2),
        winner AS (SELECT query_id, pred_label, votes FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, pred_label ASC) rn FROM votes)
          WHERE rn = 1)
        SELECT w.query_id, w.pred_label, w.votes, e.label AS true_label,
          w.pred_label = e.label AS correct
        FROM winner w JOIN embeddings e ON e.vec_id = w.query_id""")
    )
  )
}
