package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 pipeline tranche two: Bloom-filter membership sketch, inverted
  * index posting lists, equi-depth quantile binning, smoothed bigram-LM
  * fluency scoring, the cross-source n-gram contamination matrix, BPE
  * encoding, z-order layout keys, segment-level dedup with document
  * reconstruction, and duplicate-frequency capping.
  *
  * Same discipline as [[PipelineQueries]]: pure Column programs, engine-
  * portable md5-derived hashing, and integer-exact arithmetic (ppm by
  * integer division) everywhere a float sum could diverge across engines.
  */
object Pipeline2Queries {

  private val P = graft.functions.TextFunctions.HashPrime
  private val Stop = TextQueries.Stop
  private def sqlList(xs: Seq[String]) = TextQueries.sqlList(xs)

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Per-document add-one-smoothed bigram-LM fluency in exact integer ppm
    * — the shared core of q124 (top-20 readout) and q192 (tercile gate).
    * Counts are two hash aggregates over one tokenize pass; scoring is two
    * equi-joins (bigram → c_ab, first word → c_a) plus a per-doc
    * aggregate; V broadcasts as a scalar. Docs with < 2 tokens have no
    * bigrams and are (deliberately) unscored.
    */
  private def docFluency(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = docs(s, d).select(col("doc_id"), tokens(col("text")).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_a"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val docBi = base
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("b"))
    val bi = docBi.groupBy(col("b")).agg(count(lit(1)).as("c_ab"))
    docBi
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .join(bi, "b")
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), expr("((c_ab + 1) * 1000000) div (c_a + v)").as("p_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_ppm")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"), expr("sp div n_bigrams").as("fluency_ppm"))
  }

  /** q192's tier assignment (doc_id, fluency_ppm, tier) — shared with the
    * q196 stratified subsample. Boundaries are order statistics from the
    * grid rank-select (no global sort); tiering compares VALUES, so tie
    * order can never change the output.
    */
  private def perplexityTiers(s: org.apache.spark.sql.SparkSession, d: String) = {
    val scored = docFluency(s, d)
      .select(col("doc_id"), col("fluency_ppm"))
      .withColumn("k", lit(1))
      .withColumn("f_d", col("fluency_ppm").cast("double"))
      .cache()
    val bounds = graft.operators.RobustStats.rankSelectMultiByKey(
        scored, "k", "f_d", Seq((1, 3, "b1"), (2, 3, "b2")))
      .groupBy(col("k"))
      .agg(max(when(col("_q") === "b1", col("_value"))).as("bd1"),
        max(when(col("_q") === "b2", col("_value"))).as("bd2"))
      .select(col("bd1").cast(LongType).as("bd1"), col("bd2").cast(LongType).as("bd2"))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("fluency_ppm"),
        when(col("fluency_ppm") <= col("bd1"), "tail")
          .when(col("fluency_ppm") > col("bd2"), "head")
          .otherwise("middle").as("tier"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ── Bloom filter over the train-split vocabulary (m = 4096 bits,
    //    k = 2 via the two independent md5-derived hashes — the q80
    //    count-min pair), probed with the test-split vocabulary. Completes
    //    the sketch family (HLL q36, KLL-ish quantiles q63, count-min q80):
    //    the membership sketch a 100 TB pipeline ships to workers instead
    //    of a multi-TB vocabulary — 4096 bits broadcast as ONE array row,
    //    the probe side a per-row array_contains (no join, no shuffle).
    //    The Bloom guarantee (no false negatives) is a pinned-TRUE column;
    //    false positives are observable data (in_bloom ∧ ¬in_train).
    //    Splits reuse q103's hash-split rule, so train/test assignment is
    //    itself deterministic and leakage-free.
    QueryDef(
      "q121_bloom_filter",
      (s, d) => {
        val m = 4096
        val bucket = pmod(hash32(concat(lit("q103|"), col("doc_id").cast(StringType))), lit(100))
        val base = docs(s, d).select(col("text"), bucket.as("bucket"))
        def vocab(pred: org.apache.spark.sql.Column) = base.where(pred)
          .select(explode(tokens(col("text"))).as("w")).distinct()
        // consumed twice (bits aggregate + membership join) — cache the
        // vocab, which is ≪ corpus, rather than re-tokenize the train split
        val train = vocab(col("bucket") < 90).cache()
        val probe = vocab(col("bucket") >= 95)
        // the whole sketch: one 4096-element set-bits array, built by one
        // aggregation over the train vocabulary and broadcast to the probes
        val bits = train
          .select(explode(array(
            pmod(hash32(col("w")), lit(m)), pmod(hash32b(col("w")), lit(m)))).as("b"))
          .agg(collect_set(col("b")).as("bits"))
        probe
          .join(train.withColumn("hit", lit(true)), Seq("w"), "left_outer")
          .crossJoin(broadcast(bits))
          .select(col("w"),
            (array_contains(col("bits"), pmod(hash32(col("w")), lit(m))) &&
              array_contains(col("bits"), pmod(hash32b(col("w")), lit(m)))).as("in_bloom"),
            coalesce(col("hit"), lit(false)).as("in_train"))
          .withColumn("no_false_neg", !col("in_train") || col("in_bloom"))
      },
      Some(s"""WITH tw AS (SELECT DISTINCT w FROM (
            SELECT unnest(string_split(text,' ')) w FROM documents
            WHERE ('0x'||substr(md5('q103|'||doc_id::VARCHAR),1,8))::BIGINT % 100 < 90)),
        pw AS (SELECT DISTINCT w FROM (
            SELECT unnest(string_split(text,' ')) w FROM documents
            WHERE ('0x'||substr(md5('q103|'||doc_id::VARCHAR),1,8))::BIGINT % 100 >= 95)),
        bits AS (SELECT DISTINCT b FROM (
            SELECT ('0x'||substr(md5(w),1,8))::BIGINT % 4096 b FROM tw
            UNION ALL
            SELECT ('0x'||substr(md5(w),9,8))::BIGINT % 4096 FROM tw)),
        j AS (SELECT w,
            (('0x'||substr(md5(w),1,8))::BIGINT % 4096 IN (SELECT b FROM bits))
              AND (('0x'||substr(md5(w),9,8))::BIGINT % 4096 IN (SELECT b FROM bits)) AS in_bloom,
            (w IN (SELECT w FROM tw)) AS in_train
          FROM pw)
        SELECT w, in_bloom, in_train, (NOT in_train) OR in_bloom AS no_false_neg FROM j""")
    ),

    // ── Inverted-index posting lists for the corpus's top-20 terms by
    //    document frequency (stopwords excluded — they would BE the top
    //    20). The retrieval-side complement of BM25 (q97). Scale shape:
    //    document frequency is ONE map-side-combining aggregate; posting
    //    lists are materialized ONLY for the 20 queried terms (broadcast
    //    semi-join), and each list is capped at the first 100 doc_ids by
    //    TWO-PHASE rank (the q76 pattern): a (term, 100k-doc shard)-local
    //    first-100 runs fully parallel, then the global first-100 ranks
    //    only the ≤ 100×shards survivors — a hot term's million-doc
    //    posting set never funnels through one window task. The collect is
    //    bounded at 20 × 100 ids no matter the corpus size. Lists are
    //    compared by hash of the comma-joined ids (arrays hash-compare
    //    poorly across engines; strings don't).
    QueryDef(
      "q122_inverted_index",
      (s, d) => {
        val pairs = docs(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .where(!col("w").isin(Stop: _*))
          .distinct()
        val top = pairs.groupBy(col("w")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("w").asc).limit(20)
        val shard = floor(col("doc_id") / lit(100000.0)).cast(LongType)
        val local = Window.partitionBy(col("w"), col("shard")).orderBy(col("doc_id"))
        val global = Window.partitionBy(col("w")).orderBy(col("doc_id"))
        pairs.join(broadcast(top), "w")
          .withColumn("shard", shard)
          .withColumn("lrn", row_number().over(local))
          .where(col("lrn") <= 100)
          .withColumn("rn", row_number().over(global))
          .where(col("rn") <= 100)
          .groupBy(col("w"), col("df"))
          .agg(sort_array(collect_list(col("doc_id"))).as("p"))
          .select(col("w").as("term"), col("df"),
            least(col("df"), lit(100L)).as("n_posting"),
            md5(array_join(transform(col("p"), x => x.cast(StringType)), ",")).as("posting_hash"))
      },
      Some(s"""WITH pairs AS (SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text,' ')) w FROM documents)
          WHERE NOT list_contains(${sqlList(Stop)}, w)),
        df AS (SELECT w, count(*)::BIGINT df FROM pairs GROUP BY 1),
        top AS (SELECT w, df FROM df ORDER BY df DESC, w LIMIT 20)
        SELECT p.w AS term, t.df, least(t.df, 100)::BIGINT AS n_posting,
          md5(array_to_string(
            list_transform((list(p.doc_id ORDER BY p.doc_id))[1:100], x -> x::VARCHAR),
            ',')) AS posting_hash
        FROM pairs p JOIN top t ON p.w = t.w
        GROUP BY p.w, t.df""")
    ),

    // ── Equi-depth binning: exact decile boundaries of o_totalprice per
    //    order priority — the feature-bucketization pass (quantile-binned
    //    features, equi-depth histograms). All nine deciles come from ONE
    //    RobustStats rank-select pass: they share the corpus bucket-count
    //    aggregate and the grid cumsum, so nine quantiles cost the same two
    //    corpus passes as one median — vs nine per-key sort windows that
    //    would each funnel a whole key through one task.
    QueryDef(
      "q123_equi_depth",
      (s, d) => {
        val o = Tables.load(s, d, "orders").select(col("o_orderpriority"), col("o_totalprice"))
        graft.operators.RobustStats
          .rankSelectMultiByKey(o, "o_orderpriority", "o_totalprice",
            (1 to 9).map(i => (i, 10, s"d$i")))
          .select(col("o_orderpriority").as("priority"), col("_q").as("decile"),
            col("_value").as("boundary"))
      },
      Some("""WITH r AS (SELECT o_orderpriority k, o_totalprice v,
            row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) rn,
            count(*) OVER (PARTITION BY o_orderpriority) cnt
          FROM orders),
        i AS (SELECT unnest(range(1, 10)) i)
        SELECT k AS priority, 'd'||i::VARCHAR AS decile,
          max(CASE WHEN rn = (cnt * i + 9) // 10 THEN v END) AS boundary
        FROM r CROSS JOIN i GROUP BY 1, 2""")
    ),

    // ── Smoothed bigram language-model fluency score — the KenLM-style
    //    "does this read like the corpus" perplexity screen, in exact
    //    integer arithmetic (log is not bit-portable across engines, NOTES
    //    discipline): per bigram, the add-one-smoothed conditional
    //    probability in ppm, p = (c_ab + 1)·10⁶ div (c_a + V); per doc,
    //    the mean over its bigrams by integer division. Counts are two
    //    hash aggregates over one tokenize pass; scoring is two equi-joins
    //    (bigram → c_ab, first word → c_a) and a per-doc aggregate; V
    //    broadcasts as a scalar. Top-20 most-fluent docs via TakeOrdered.
    QueryDef(
      "q124_bigram_lm",
      (s, d) => docFluency(s, d)
        .orderBy(col("fluency_ppm").desc, col("doc_id").asc)
        .limit(20),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        uni AS (SELECT w, count(*)::BIGINT c_a FROM (SELECT unnest(t) w FROM t) GROUP BY 1),
        v AS (SELECT count(*)::BIGINT v FROM uni),
        db AS (SELECT doc_id, unnest(list_transform(range(0, len(t)-1), j -> t[j+1]||' '||t[j+2])) b
               FROM t WHERE len(t) >= 2),
        bi AS (SELECT b, count(*)::BIGINT c_ab FROM db GROUP BY 1),
        sc AS (SELECT doc_id, ((c_ab + 1) * 1000000) // (c_a + v) AS p_ppm
               FROM db JOIN bi USING (b)
               JOIN uni ON uni.w = string_split(db.b, ' ')[1]
               CROSS JOIN v)
        SELECT doc_id, count(*)::BIGINT AS n_bigrams,
          CAST(sum(p_ppm) // count(*) AS BIGINT) AS fluency_ppm
        FROM sc GROUP BY doc_id
        ORDER BY fluency_ppm DESC, doc_id ASC LIMIT 20""")
    ),

    // ── Per-document perplexity gate (CCNet's head/middle/tail bucketing,
    //    Wenzek et al. 2020 §3.3; r6 verdict Next #5): every scored doc is
    //    assigned its fluency TERCILE under the corpus bigram LM — 'tail'
    //    (least corpus-like: the candidates a curation pipeline drops or
    //    down-samples), 'middle', 'head'. Exact and scale-safe: the two
    //    boundaries are order statistics at ranks ⌈n/3⌉ and ⌈2n/3⌉ from
    //    [[graft.operators.RobustStats.rankSelectMultiByKey]] (grid-bounded
    //    rank-select — no global sort, no single-partition window), and
    //    tiering compares VALUES, so tie order can never change the output.
    //    The per-doc score table (one narrow row per doc) is cached: the
    //    boundary machinery reads it twice and the final projection once.
    QueryDef(
      "q192_perplexity_gate",
      (s, d) => perplexityTiers(s, d),
      Some("""WITH t0 AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        uni AS (SELECT w, count(*)::BIGINT c_a FROM (SELECT unnest(t) w FROM t0) GROUP BY 1),
        v AS (SELECT count(*)::BIGINT v FROM uni),
        db AS (SELECT doc_id, unnest(list_transform(range(0, len(t)-1), j -> t[j+1]||' '||t[j+2])) b
               FROM t0 WHERE len(t) >= 2),
        bi AS (SELECT b, count(*)::BIGINT c_ab FROM db GROUP BY 1),
        sc AS (SELECT doc_id, ((c_ab + 1) * 1000000) // (c_a + v) AS p_ppm
               FROM db JOIN bi USING (b)
               JOIN uni ON uni.w = string_split(db.b, ' ')[1]
               CROSS JOIN v),
        f AS (SELECT doc_id, CAST(sum(p_ppm) // count(*) AS BIGINT) fluency_ppm
              FROM sc GROUP BY 1),
        r AS (SELECT fluency_ppm, row_number() OVER (ORDER BY fluency_ppm) rn,
                     (SELECT count(*) FROM f) c FROM f),
        b AS (SELECT max(CASE WHEN rn = (c*1+2)//3 THEN fluency_ppm END) bd1,
                     max(CASE WHEN rn = (c*2+2)//3 THEN fluency_ppm END) bd2 FROM r)
        SELECT doc_id, fluency_ppm,
          CASE WHEN fluency_ppm <= (SELECT bd1 FROM b) THEN 'tail'
               WHEN fluency_ppm >  (SELECT bd2 FROM b) THEN 'head'
               ELSE 'middle' END AS tier
        FROM f""")
    ),

    // ── CCNet's actual last step (Wenzek et al. 2020 §3.3): the tercile
    //    gate FEEDS a stratified subsample — head and middle pass whole,
    //    the tail (least corpus-like third) is down-sampled, here to a
    //    deterministic 20% by the house salted-hash rule (q103/q85's
    //    discipline: reruns and retries keep exactly the same docs, no
    //    RNG). Composes q192's tier table (shared `perplexityTiers` core)
    //    with one `.where` — the same compositional shape the classifier
    //    gate (q191 → q85) declares. At 100 TB nothing new shuffles: the
    //    filter is per-row on the already-cached narrow score table.
    QueryDef(
      "q196_ccnet_sample",
      (s, d) => perplexityTiers(s, d)
        .where(col("tier") =!= "tail" ||
          pmod(graft.functions.TextFunctions.hash32(
            concat(lit("q196|"), col("doc_id").cast("string"))), lit(5)) === 0),
      Some("""WITH t0 AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        uni AS (SELECT w, count(*)::BIGINT c_a FROM (SELECT unnest(t) w FROM t0) GROUP BY 1),
        v AS (SELECT count(*)::BIGINT v FROM uni),
        db AS (SELECT doc_id, unnest(list_transform(range(0, len(t)-1), j -> t[j+1]||' '||t[j+2])) b
               FROM t0 WHERE len(t) >= 2),
        bi AS (SELECT b, count(*)::BIGINT c_ab FROM db GROUP BY 1),
        sc AS (SELECT doc_id, ((c_ab + 1) * 1000000) // (c_a + v) AS p_ppm
               FROM db JOIN bi USING (b)
               JOIN uni ON uni.w = string_split(db.b, ' ')[1]
               CROSS JOIN v),
        f AS (SELECT doc_id, CAST(sum(p_ppm) // count(*) AS BIGINT) fluency_ppm
              FROM sc GROUP BY 1),
        r AS (SELECT fluency_ppm, row_number() OVER (ORDER BY fluency_ppm) rn,
                     (SELECT count(*) FROM f) c FROM f),
        b AS (SELECT max(CASE WHEN rn = (c*1+2)//3 THEN fluency_ppm END) bd1,
                     max(CASE WHEN rn = (c*2+2)//3 THEN fluency_ppm END) bd2 FROM r),
        g AS (SELECT doc_id, fluency_ppm,
                CASE WHEN fluency_ppm <= (SELECT bd1 FROM b) THEN 'tail'
                     WHEN fluency_ppm >  (SELECT bd2 FROM b) THEN 'head'
                     ELSE 'middle' END AS tier
              FROM f)
        SELECT doc_id, fluency_ppm, tier FROM g
        WHERE tier <> 'tail'
           OR ('0x'||substr(md5('q196|'||doc_id::VARCHAR),1,8))::BIGINT % 5 = 0""")
    ),

    // ── Cross-source contamination matrix: pairwise 5-gram Jaccard overlap
    //    between sources — the corpus-level train/benchmark contamination
    //    report (is source A leaking into source B?). Per-source DISTINCT
    //    gram-hash sets (the fused shingle-hash expression, one tokenize
    //    pass), set sizes by hash aggregate, intersections by ONE equi-join
    //    on the gram hash — never a source×source cross product; candidate
    //    work is bounded by shared-gram volume, the thing being measured.
    //    Jaccard in exact integer ppm.
    QueryDef(
      "q125_contamination",
      (s, d) => {
        val grams = docs(s, d)
          .select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"),
            explode(graft.functions.HashExpressions.shingleHash32(col("toks"), 5)).as("g"))
          .distinct()
        val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = grams.toDF("s1", "g")
          .join(grams.toDF("s2", "g2"), col("g") === col("g2") && col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.toDF("s1", "n1")), "s1")
          .join(broadcast(sizes.toDF("s2", "n2")), "s2")
          .select(col("s1"), col("s2"), col("n1"), col("n2"), col("inter"),
            expr("(inter * 1000000) div (n1 + n2 - inter)").as("jaccard_ppm"))
      },
      Some(s"""WITH t AS (SELECT source, string_split(text,' ') t FROM documents),
        g AS (SELECT DISTINCT source, gh FROM (
            SELECT source, unnest(list_transform(
                list_transform(range(0, len(t)-4),
                  j -> t[j+1]||' '||t[j+2]||' '||t[j+3]||' '||t[j+4]||' '||t[j+5]),
                x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P)) gh
            FROM t WHERE len(t) >= 5)),
        sz AS (SELECT source, count(*)::BIGINT n FROM g GROUP BY 1),
        iv AS (SELECT a.source s1, b.source s2, count(*)::BIGINT inter
               FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source GROUP BY 1, 2)
        SELECT s1, s2, sa.n AS n1, sb.n AS n2, inter,
          (inter * 1000000) // (sa.n + sb.n - inter) AS jaccard_ppm
        FROM iv JOIN sz sa ON sa.source = iv.s1 JOIN sz sb ON sb.source = iv.s2""")
    ),

    // ── BPE ENCODE — the other half of q113: replay the 5 trained merges to
    //    the round-5 vocabulary, then tokenize the corpus with it. The scale
    //    contract is the same as training's: the corpus collapses ONCE to
    //    distinct (word, count); the 5 merge folds run over that vocab (the
    //    `aggregate` HOF pending-symbol fold, exact greedy left-to-right);
    //    the final word→n_tokens table comes back to the corpus as ONE
    //    equi-join on the word (never broadcast — a 100 TB corpus's vocab is
    //    itself big). Per-source fertility (BPE tokens per whitespace token,
    //    integer ppm) is the tokenizer-quality number a data pipeline tracks.
    QueryDef(
      "q126_bpe_encode",
      (s, d) => {
        var vocab = docs(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) > 0)
          .groupBy(col("word")).agg(count(lit(1)).as("wn"))
          .withColumn("syms",
            expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          // localCheckpoint per round, not cache — truncated lineage, same
          // rows (the q113/q140 iterative-plan-blowup fix; the audit read a
          // 1,132-line declared plan here before it)
          .localCheckpoint(false)
        for (_ <- 1 to 5) {
          val pairs = vocab.where(size(col("syms")) > 1)
            .select(col("wn"), explode(expr(
              "transform(sequence(1, size(syms)-1), i -> named_struct('a', syms[i-1], 'b', syms[i]))")).as("p"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum(col("wn")).as("pn"))
          val top = pairs.orderBy(col("pn").desc, col("a").asc, col("b").asc).limit(1)
          vocab = vocab
            .crossJoin(broadcast(top.select(col("a").as("ma"), col("b").as("mb"))))
            .withColumn("syms", expr(
              """aggregate(syms,
                   named_struct('acc', cast(array() as array<string>), 'p', ''),
                   (st, x) -> CASE
                     WHEN st.p = '' THEN named_struct('acc', st.acc, 'p', x)
                     WHEN st.p = ma AND x = mb
                       THEN named_struct('acc', concat(st.acc, array(concat(ma, mb))), 'p', '')
                     ELSE named_struct('acc', concat(st.acc, array(st.p)), 'p', x) END,
                   st -> CASE WHEN st.p = '' THEN st.acc
                              ELSE concat(st.acc, array(st.p)) END)"""))
            .select(col("word"), col("wn"), col("syms"))
            .localCheckpoint(false)
        }
        val perWord = vocab.select(col("word"), size(col("syms")).cast(LongType).as("n_tok"))
        docs(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) > 0)
          .join(perWord, "word")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("ws_tokens"), sum(col("n_tok")).as("bpe_tokens"))
          .select(col("source"), col("ws_tokens"), col("bpe_tokens"),
            expr("(bpe_tokens * 1000000) div ws_tokens").as("fertility_ppm"))
      },
      Some {
        // identical merge-replay CTEs as q113's oracle, then the corpus join
        val rounds = (1 to 5).map { r =>
          val prev = s"vocab${r - 1}"
          s"""pairs$r AS (SELECT syms[i] a, syms[i+1] b, sum(wn)::BIGINT pn
          FROM $prev, unnest(generate_series(1, len(syms)-1)) t(i)
          GROUP BY 1,2),
        top$r AS (SELECT a, b FROM pairs$r ORDER BY pn DESC, a, b LIMIT 1),
        m$r AS (
          SELECT v.word, v.wn, v.syms, t.a, t.b, 1::BIGINT i, CAST([] AS VARCHAR[]) acc
          FROM $prev v CROSS JOIN top$r t
          UNION ALL
          SELECT word, wn, syms, a, b,
            CASE WHEN i < len(syms) AND syms[i]=a AND syms[i+1]=b THEN i+2 ELSE i+1 END,
            CASE WHEN i < len(syms) AND syms[i]=a AND syms[i+1]=b THEN list_append(acc, a||b)
                 ELSE list_append(acc, syms[i]) END
          FROM m$r WHERE i <= len(syms)),
        vocab$r AS (SELECT word, wn, acc syms FROM m$r WHERE i = len(syms)+1)"""
        }.mkString(",\n        ")
        s"""WITH RECURSIVE
        vocab0 AS (
          SELECT w AS word, count(*)::BIGINT wn, string_split(w, '') syms
          FROM (SELECT unnest(string_split(text, ' ')) w FROM documents)
          WHERE len(w) > 0 GROUP BY w),
        $rounds,
        pw AS (SELECT word, len(syms)::BIGINT n_tok FROM vocab5),
        cw AS (SELECT source, w AS word FROM
                 (SELECT source, unnest(string_split(text, ' ')) w FROM documents)
               WHERE len(w) > 0)
        SELECT source, count(*)::BIGINT AS ws_tokens, sum(n_tok)::BIGINT AS bpe_tokens,
          CAST((sum(n_tok) * 1000000) // count(*) AS BIGINT) AS fertility_ppm
        FROM cw JOIN pw USING (word) GROUP BY source"""
      }
    ),

    // ── Z-ORDER clustering keys — the multi-dimensional data-layout op a
    //    100 TB lakehouse runs so per-file min/max stats can skip on BOTH
    //    join keys at once. The z-value is a pure bit-interleave of the two
    //    16-bit quantized dimensions (the classic 4-step spread-bits
    //    sequence), expressed in portable integer shift/mask arithmetic so
    //    Spark and DuckDB compute bit-identical keys — no UDF, codegen'd,
    //    shuffle-free. Bucketing is zval*64 div 2^32 (no ntile — a global
    //    sort window would funnel the corpus through one task). The output
    //    is the skipping evidence itself: per-bucket min/max spans on both
    //    dimensions, each a small fraction of the full domain, where a
    //    single-column sort leaves the other dimension's span at 100%.
    //    The actual layout WRITE (repartitionByRange(zval) + sort) is
    //    jobs/ZOrderLayout; this query pins the key math and the tightness.
    //    Dimensions are quantized RELATIVE TO THEIR DOMAIN (v·2^16 div
    //    (max+1), max from one scalar aggregate that broadcasts) — absolute
    //    mod-2^16 would leave a small-keyed table entirely in bucket 0.
    QueryDef(
      "q127_zorder",
      (s, d) => {
        val raw = Tables.load(s, d, "lineitem")
          .select(col("l_partkey").cast(LongType).as("p"),
            col("l_suppkey").cast(LongType).as("k"))
        val bounds = raw.agg(max(col("p")).as("mp"), max(col("k")).as("mk"))
        val li = raw.crossJoin(broadcast(bounds))
          .select(expr("(p * 65536) div (mp + 1)").as("x"),
            expr("(k * 65536) div (mk + 1)").as("y"))
        def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
          val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
          val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
          val e = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
          e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
        }
        li.withColumn("z", spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1)))
          .withColumn("bucket", expr("(z * 64) div 4294967296"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .withColumn("span_ppm", expr(
            "((max_x - min_x + 1) * (max_y - min_y + 1) * 1000000) div 4294967296"))
      },
      Some("""WITH b AS (SELECT max(l_partkey)::BIGINT mp, max(l_suppkey)::BIGINT mk FROM lineitem),
        q AS (SELECT (l_partkey * 65536) // (mp + 1) x, (l_suppkey * 65536) // (mk + 1) y
              FROM lineitem CROSS JOIN b),
        s1 AS (SELECT x, y,
            ((x | (x << 8)) & 16711935) sx0, ((y | (y << 8)) & 16711935) sy0 FROM q),
        s2 AS (SELECT x, y,
            ((sx0 | (sx0 << 4)) & 252645135) sx1, ((sy0 | (sy0 << 4)) & 252645135) sy1 FROM s1),
        s3 AS (SELECT x, y,
            ((sx1 | (sx1 << 2)) & 858993459) sx2, ((sy1 | (sy1 << 2)) & 858993459) sy2 FROM s2),
        s4 AS (SELECT x, y,
            ((sx2 | (sx2 << 1)) & 1431655765) sx, ((sy2 | (sy2 << 1)) & 1431655765) sy FROM s3),
        z AS (SELECT x, y, (sx | (sy << 1)) z FROM s4)
        SELECT (z * 64) // 4294967296 AS bucket, count(*)::BIGINT n,
          min(x) min_x, max(x) max_x, min(y) min_y, max(y) max_y,
          ((max(x) - min(x) + 1) * (max(y) - min(y) + 1) * 1000000) // 4294967296 AS span_ppm
        FROM z GROUP BY 1""")
    ),

    // ── Segment-level dedup WITH document reconstruction — the CCNet /
    //    MassiveText pass that q40/q75 (whole-doc) and q92 (span detection)
    //    don't cover: split every document into fixed 10-token segments,
    //    keep each distinct segment's globally-FIRST occurrence (lowest
    //    (doc_id, position)), and REWRITE each document from its surviving
    //    segments in original order. Removes cross-document boilerplate and
    //    intra-document repetition in one pass. Scale shape: one tokenize
    //    pass; first-occurrence is ONE map-side-combining min-aggregate on
    //    the segment's md5 (128-bit — no collision handling needed); the
    //    keep decision rejoins by the same equi-key; reconstruction is a
    //    per-doc aggregate bounded by document size. No windows, no
    //    pair-joins — a hot boilerplate segment costs one combiner cell,
    //    never a task-funnel. The (doc_id, ix) pair packs into one BIGINT
    //    (stride 2^20 ≥ any real segment count: 10 M-token docs) so the
    //    min-aggregate stays a primitive, not a struct.
    QueryDef(
      "q128_segment_dedup",
      (s, d) => {
        val segLen = 10
        val segs = docs(s, d)
          .where(length(col("text")) > 0)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            (expr("(size(toks) - 1) div 10") + 1).cast(LongType).as("n_segs"),
            posexplode(expr(
              s"transform(sequence(0, (size(toks)-1) div $segLen), " +
                s"i -> array_join(slice(toks, i*$segLen+1, $segLen), ' '))")).as(Seq("ix", "seg")))
          .withColumn("h", md5(col("seg")))
          .withColumn("pk", col("doc_id") * lit(1048576L) + col("ix"))
        val first = segs.groupBy(col("h")).agg(min(col("pk")).as("keep_pk"))
        segs.join(first, "h")
          .where(col("pk") === col("keep_pk"))
          .groupBy(col("doc_id"))
          .agg(max(col("n_segs")).as("n_segs"),
            count(lit(1)).as("n_kept"),
            md5(array_join(
              transform(array_sort(collect_list(struct(col("ix"), col("seg")))),
                x => x.getField("seg")), " ")).as("new_hash"))
          .select(col("doc_id"), col("n_segs"), col("n_kept"), col("new_hash"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') toks
              FROM documents WHERE length(text) > 0),
        segs AS (SELECT doc_id, i AS ix,
            array_to_string(toks[i*10+1 : i*10+10], ' ') seg,
            (len(toks) - 1) // 10 + 1 AS n_segs
          FROM t, unnest(range(0, (len(toks)-1)//10 + 1)) u(i)),
        h AS (SELECT doc_id, ix, seg, n_segs, md5(seg) h,
            doc_id * 1048576 + ix AS pk FROM segs),
        first AS (SELECT h, min(pk) keep_pk FROM h GROUP BY 1)
        SELECT doc_id, max(n_segs)::BIGINT AS n_segs, count(*)::BIGINT AS n_kept,
          md5(string_agg(seg, ' ' ORDER BY ix)) AS new_hash
        FROM h JOIN first USING (h)
        WHERE pk = keep_pk
        GROUP BY doc_id""")
    ),

    // ── Duplicate-frequency capping: keep at most K = 2 copies of each
    //    canonical text — the middle ground between keep-everything and
    //    dedup-keep-first that corpus-mixing recipes use when limited
    //    duplication is wanted (e.g. up-weighting high-quality sources but
    //    capping the clone tail). Canonical key is the fused single-pass
    //    CanonAlnum (q75); survivors are the K lowest doc_ids per key,
    //    selected by TWO-PHASE rank (the q76/q122 pattern): a (key, 64-way
    //    doc_id shard)-local first-K runs fully parallel, then the global
    //    first-K ranks only the ≤ K·64 shard survivors — a million-clone
    //    key never funnels its whole group through one window task. Group
    //    sizes come from the separate map-side-combining count aggregate
    //    (skew-safe), joined back on the key.
    QueryDef(
      "q129_dup_cap",
      (s, d) => {
        val k = 2
        val keyed = docs(s, d)
          .where(length(col("text")) > 0)
          .select(col("doc_id"),
            md5(graft.functions.CanonicalizeExpressions.canonAlnum(col("text"))).as("canon_hash"))
        val counts = keyed.groupBy(col("canon_hash")).agg(count(lit(1)).as("n_dups"))
        val local = Window
          .partitionBy(col("canon_hash"), pmod(col("doc_id"), lit(64)))
          .orderBy(col("doc_id"))
        val global = Window.partitionBy(col("canon_hash")).orderBy(col("doc_id"))
        keyed
          .withColumn("lrn", row_number().over(local))
          .where(col("lrn") <= k)
          .withColumn("copy_rank", row_number().over(global))
          .where(col("copy_rank") <= k)
          .join(counts, "canon_hash")
          .select(col("doc_id"), col("canon_hash"),
            col("copy_rank").cast(LongType).as("copy_rank"), col("n_dups"))
      },
      Some("""WITH c AS (SELECT doc_id,
            md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) canon_hash
          FROM documents WHERE length(text) > 0),
        n AS (SELECT canon_hash, count(*)::BIGINT n_dups FROM c GROUP BY 1),
        r AS (SELECT doc_id, canon_hash,
            row_number() OVER (PARTITION BY canon_hash ORDER BY doc_id) rk FROM c)
        SELECT r.doc_id, r.canon_hash, rk::BIGINT AS copy_rank, n.n_dups
        FROM r JOIN n USING (canon_hash) WHERE rk <= 2""")
    )
  )
}
