package graft.queries

import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis capability surface over `documents`: token counting
  * (whitespace + BPE-ish regex), quality scoring, n-gram-profile language
  * ID, and rolling-hash / winnowing document fingerprints. Pure Column
  * programs — no UDFs — so everything stays codegen-able and pushdown-safe.
  */
object TextQueries {

  private val P = TextFunctions.HashPrime

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")

  /** English-ish stopword list used by the quality score (shared with the
    * q85 curation composition).
    */
  private[graft] val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private[queries] def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Winnowed fingerprints per document (q33's pipeline, shared with the
    * fingerprint-overlap dedup q61): (doc_id, doc_hash, fp) — 4-token
    * grams, window 5, computed ENTIRELY per-row with array HOFs: the
    * window-min over 5 consecutive gram hashes is `array_min(slice(gh,
    * j+1, 5))` inside a transform, and the DISTINCT collapses inside the
    * row as `array_distinct` — so the whole pipeline is a projection +
    * generate with ZERO shuffles at any corpus size (the previous
    * posexplode + row-window form shuffled every gram by doc_id; measured
    * 3× slower). The one trap this avoids: `gh` is staged as its own
    * attribute first — an inlined md5/shingle expression would be
    * re-evaluated once per window by the interpreted lambda (the
    * [[graft.operators.Dedup.simhashWord]] lesson).
    */
  private def winnowedFingerprints(docsDf: org.apache.spark.sql.DataFrame) = {
    val staged = docsDf
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        rollingHash(col("text")).as("doc_hash"),
        graft.functions.HashExpressions.shingleHash32(col("toks"), 4).as("gh")
      )
      .select(col("doc_id"), col("doc_hash"), col("gh"), size(col("gh")).as("n"))
    staged
      .select(col("doc_id"), col("doc_hash"),
        explode(array_distinct(
          when(col("n") < 5, col("gh"))
            .otherwise(transform(sequence(lit(0), col("n") - 5),
              j => array_min(slice(col("gh"), j + 1, lit(5))))))).as("fp"))
    // no cache here: the pass is shuffle-free and cheap; q61, which reads
    // the result four times in one plan, caches its own projection
  }

  val defs: Seq[QueryDef] = Seq(

    // ── Token counting: whitespace tokens, BPE-ish subword segments,
    //    distinct tokens, characters. One narrow projection pass.
    QueryDef(
      "q30_token_count",
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit(BpeTokenPattern), lit(0))).cast(LongType).as("bpe_tokens"),
          size(array_distinct(tokens(col("text")))).cast(LongType).as("uniq_tokens"),
          length(col("text")).cast(LongType).as("n_chars")
        ),
      Some(s"""SELECT doc_id,
        len(string_split(text, ' '))::BIGINT AS ws_tokens,
        len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS bpe_tokens,
        len(list_distinct(string_split(text, ' ')))::BIGINT AS uniq_tokens,
        length(text)::BIGINT AS n_chars
        FROM documents""")
    ),

    // ── Quality scoring: lexical-diversity, token-length, and stopword
    //    components combined into one [0,1] score — the standard cheap
    //    pre-filter before expensive pipeline stages.
    QueryDef(
      "q31_quality_score",
      (s, d) => {
        val t = tokens(col("text"))
        val nTok = size(t).cast(DoubleType)
        val uniqRatio = size(array_distinct(t)).cast(DoubleType) / nTok
        val avgLen = aggregate(transform(t, x => length(x).cast(LongType)), lit(0L), _ + _).cast(DoubleType) / nTok
        val stopRatio = size(filter(t, x => x.isin(Stop: _*))).cast(DoubleType) / nTok
        docs(s, d).select(
          col("doc_id"),
          size(t).cast(LongType).as("n_tokens"),
          uniqRatio.as("uniq_ratio"),
          avgLen.as("avg_token_len"),
          stopRatio.as("stop_ratio"),
          (lit(0.5) * uniqRatio + lit(0.3) * least(avgLen / 8.0, lit(1.0)) + lit(0.2) * stopRatio).as("quality")
        )
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        m AS (SELECT doc_id,
          len(t)::BIGINT n_tokens,
          len(list_distinct(t))::DOUBLE / len(t)::DOUBLE uniq_ratio,
          CAST(list_reduce(list_prepend(0::BIGINT, list_transform(t, x -> length(x)::BIGINT)), (a,b) -> a+b) AS DOUBLE) / len(t)::DOUBLE avg_token_len,
          len(list_filter(t, x -> list_contains(${sqlList(Stop)}, x)))::DOUBLE / len(t)::DOUBLE stop_ratio
         FROM d)
        SELECT doc_id, n_tokens, uniq_ratio, avg_token_len, stop_ratio,
          0.5*uniq_ratio + 0.3*least(avg_token_len/8.0, 1.0) + 0.2*stop_ratio AS quality
        FROM m""")
    ),

    // ── Language ID: combined n-gram heuristic — per-language score =
    //    2 × stopword hits + characteristic char-bigram hits, argmax with
    //    deterministic first-wins tiebreak. (The corpus is synthetic, so
    //    the interesting property is determinism, not accuracy.)
    QueryDef(
      "q32_langid",
      (s, d) => {
        val staged = docs(s, d).select(
          col("doc_id"), col("lang"),
          tokens(col("text")).as("t"),
          charBigrams(col("text")).as("bg")
        )
        val scoreCols = LangProfiles.zip(LangBigramProfiles).map {
          case ((lang, words), (_, bigrams)) =>
            (size(filter(col("t"), x => x.isin(words: _*))).cast(LongType) * 2L +
              size(filter(col("bg"), x => x.isin(bigrams: _*))).cast(LongType)).as(s"s_$lang")
        }
        val langs = LangProfiles.map(_._1)
        val pred = langs.foldRight(lit(langs.last): org.apache.spark.sql.Column) { (lang, rest) =>
          val mine = col(s"s_$lang")
          val beatsAll = langs.filter(_ != lang).map(o => mine >= col(s"s_$o")).reduce(_ && _)
          when(beatsAll, lit(lang)).otherwise(rest)
        }
        staged
          .select((col("doc_id") +: col("lang") +: scoreCols): _*)
          .withColumn("pred_lang", pred)
          .withColumn("correct", col("pred_lang") === col("lang"))
      },
      Some {
        val scoreSelects = LangProfiles.zip(LangBigramProfiles).map {
          case ((lang, words), (_, bigrams)) =>
            s"""(len(list_filter(t, x -> list_contains(${sqlList(words)}, x)))::BIGINT * 2 +
               | len(list_filter(bg, x -> list_contains(${sqlList(bigrams)}, x)))::BIGINT) s_$lang""".stripMargin
        }.mkString(",\n          ")
        val langs = LangProfiles.map(_._1)
        val whenChain = langs.dropRight(1).map { lang =>
          val cond = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
          s"WHEN $cond THEN '$lang'"
        }.mkString(" ")
        s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') t,
          CASE WHEN length(text) >= 2
               THEN list_transform(range(1, length(text)), i -> substr(text, i, 2))
               ELSE [] END bg
         FROM documents),
        sc AS (SELECT doc_id, lang,
          $scoreSelects
         FROM d)
        SELECT doc_id, lang, ${langs.map(l => s"s_$l").mkString(", ")},
          CASE $whenChain ELSE '${langs.last}' END AS pred_lang,
          (CASE $whenChain ELSE '${langs.last}' END) = lang AS correct
        FROM sc"""
      }
    ),

    // ── TF-IDF-style term scoring: tf = in-doc frequency, idf as the raw
    //    N/df ratio (division-only arithmetic — no cross-engine log()
    //    hazards), top-3 terms per doc. The N scalar broadcasts; everything
    //    else is two hash aggregates and a window.
    QueryDef(
      "q35_tfidf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val terms = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).cast(LongType).as("n_tok"), explode(col("toks")).as("term"))
        val tf = terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("c"), min(col("n_tok")).as("n_tok"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
        tf.join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            (col("c").cast(DoubleType) / col("n_tok").cast(DoubleType)) *
              (col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("score"), col("rn"))
      },
      Some("""WITH t AS (SELECT doc_id, len(string_split(text,' '))::BIGINT n_tok, unnest(string_split(text,' ')) term FROM documents),
        tf AS (SELECT doc_id, term, count(*) c, min(n_tok) n_tok FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        n AS (SELECT count(*) n_docs FROM documents),
        sc AS (SELECT doc_id, term,
          (c::DOUBLE / n_tok::DOUBLE) * (n_docs::DOUBLE / df::DOUBLE) score
          FROM tf JOIN df USING (term) CROSS JOIN n)
        SELECT doc_id, term, score, rn FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) rn FROM sc)
        WHERE rn <= 3""")
    ),

    // ── Sketches: HLL distinct-count. Approx estimates differ across
    //    engines by design, so the estimate itself can't be hash-compared —
    //    instead the query emits the EXACT companions (count distinct, row
    //    count) for the oracle hash plus `hll_ok`, a Spark-side assertion
    //    that the HLL estimate (rsd 0.02) lands within ±10% (5 sigma — a
    //    tighter bound would make a correct sketch fail the gate on an
    //    unlucky dataset) of the exact count; the oracle pins that column
    //    to TRUE. The driver's gate therefore checks both the exact
    //    aggregates and the sketch's accuracy bound. The ScalaTest spec
    //    additionally bounds the raw estimate.
    QueryDef(
      "q36_sketches",
      (s, d) =>
        docs(s, d)
          .select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"), explode(col("toks")).as("term"))
          .groupBy(col("source"))
          .agg(
            approx_count_distinct(col("term"), 0.02).as("approx_terms"),
            countDistinct(col("term")).as("exact_terms"),
            count(lit(1)).as("n")
          )
          .select(
            col("source"),
            col("exact_terms"),
            col("n"),
            (abs(col("approx_terms") - col("exact_terms")).cast(DoubleType) <=
              lit(0.10) * col("exact_terms").cast(DoubleType)).as("hll_ok")
          ),
      Some("""WITH t AS (SELECT source, unnest(string_split(text, ' ')) term FROM documents)
        SELECT source, count(DISTINCT term) AS exact_terms, count(*) AS n, TRUE AS hll_ok
        FROM t GROUP BY source""")
    ),

    // ── Quantile sketches: approx_percentile (positive-indexed KLL-style
    //    summary) gated like q36 — exact aggregates hash-checked, the
    //    estimates asserted within tolerance of Spark's own EXACT
    //    percentile and pinned TRUE by the oracle. Cross-engine quantile
    //    interpolation differs by design, so the bound is the checkable
    //    contract.
    QueryDef(
      "q63_quantile_sketch",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val tol = lit(0.05) * (col("mx") - col("mn")) + lit(1e-9)
        li.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            min(col("l_quantity")).as("mn"),
            max(col("l_quantity")).as("mx"),
            percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("ap50"),
            percentile_approx(col("l_quantity"), lit(0.9), lit(1000)).as("ap90"),
            expr("percentile(l_quantity, 0.5)").as("ep50"),
            expr("percentile(l_quantity, 0.9)").as("ep90")
          )
          .select(
            col("l_returnflag"), col("n"), col("mn"), col("mx"),
            (abs(col("ap50") - col("ep50")) <= tol).as("p50_ok"),
            (abs(col("ap90") - col("ep90")) <= tol).as("p90_ok")
          )
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          min(l_quantity) AS mn, max(l_quantity) AS mx,
          TRUE AS p50_ok, TRUE AS p90_ok
        FROM lineitem GROUP BY l_returnflag""")
    ),

    // ── Corpus n-gram statistics: top-100 bigrams with deterministic
    //    tiebreak — TakeOrderedAndProject over a hash aggregate, the
    //    vocabulary-building pass of a tokenizer pipeline.
    QueryDef(
      "q34_ngram_freq",
      (s, d) =>
        docs(s, d)
          .select(tokens(col("text")).as("toks"))
          .select(explode(shingles(col("toks"), 2)).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(100),
      Some("""WITH d AS (SELECT string_split(text, ' ') t FROM documents),
        b AS (SELECT unnest(list_transform(range(0, len(t)-1), j -> t[j+1]||' '||t[j+2])) bigram FROM d)
        SELECT bigram, count(*) AS n FROM b GROUP BY bigram
        ORDER BY n DESC, bigram ASC LIMIT 100""")
    ),

    // ── Document fingerprinting: whole-document polynomial rolling hash +
    //    MOSS-style winnowing fingerprint set (4-token grams, window 5),
    //    one row per retained fingerprint. Winnowing is per-row array-HOF
    //    work over a STAGED gram-hash attribute (see winnowedFingerprints):
    //    zero shuffles at any corpus size. The earlier interpreted-lambda
    //    pathology (winnowMins re-evaluating the inlined md5 chain per
    //    window, 60ms/doc) is exactly what staging the array avoids.
    QueryDef(
      "q33_fingerprint",
      (s, d) => winnowedFingerprints(docs(s, d)),
      Some(s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') t FROM documents),
        g AS (SELECT doc_id, text,
          list_transform(list_transform(range(0, len(t)-3), j -> t[j+1]||' '||t[j+2]||' '||t[j+3]||' '||t[j+4]),
                         x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P) gh
         FROM d WHERE len(t) >= 4),
        wn AS (SELECT doc_id, text,
          CASE WHEN len(gh) >= 5
               THEN list_transform(range(0, len(gh)-4), j -> list_aggregate(list_slice(gh, j+1, j+5), 'min'))
               ELSE gh END mins
         FROM g),
        fp AS (SELECT DISTINCT doc_id, text, unnest(mins) fp FROM wn)
        SELECT doc_id,
          list_reduce(list_prepend(0::BIGINT, list_transform(string_split(text,''), c -> ord(c)::BIGINT)), (a,b) -> (a*31+b) % $P) AS doc_hash,
          fp
        FROM fp""")
    ),

    // ── Benchmark DECONTAMINATION: training docs sharing any 5-gram with
    //    the benchmark set (here: docs 0..19 stand in for an eval suite)
    //    are flagged with their overlap count — the n-gram-collision
    //    contamination check run before any training corpus ships. One
    //    equi-join on the gram hash; the benchmark side is tiny and
    //    broadcastable at any corpus scale.
    QueryDef(
      "q73_decontamination",
      (s, d) => {
        val grams = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(array_distinct(graft.functions.HashExpressions.shingleHash32(col("toks"), 5))).as("g"))
        val bench = grams.where(col("doc_id") < 20).select(col("g")).distinct()
        grams.where(col("doc_id") >= 20)
          .join(bench, "g")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_contaminated_grams"))
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                list_transform(range(0, len(t)-4), j -> t[j+1]||' '||t[j+2]||' '||t[j+3]||' '||t[j+4]||' '||t[j+5]),
                x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P))) g
             FROM d WHERE len(t) >= 5),
        bench AS (SELECT DISTINCT g FROM g WHERE doc_id < 20)
        SELECT doc_id, count(*) AS n_contaminated_grams
        FROM g JOIN bench USING (g)
        WHERE doc_id >= 20 GROUP BY doc_id""")
    ),

    // ── C4-style rule filter: the cheap boolean gauntlet (terminal
    //    punctuation, minimum length, sane word lengths, stopword
    //    presence) every web-scale corpus passes through before the
    //    expensive pipeline stages. Each rule is its own audited column.
    QueryDef(
      "q74_rule_filter",
      (s, d) => {
        val t = tokens(col("text"))
        val rules = Seq(
          ("r_terminal", col("text").rlike("[.!?]$")),
          ("r_min_words", size(t) >= 10),
          ("r_word_len", size(filter(t, x => length(x) > 20)) === 0),
          ("r_stopword", size(filter(t, x => x.isin(Stop: _*))) > 0)
        )
        docs(s, d).select(
          (col("doc_id") +: rules.map { case (n, c) => c.as(n) } :+
            rules.map(_._2).reduce(_ && _).as("keep")): _*)
      },
      Some(s"""WITH d AS (SELECT doc_id, text, string_split(text,' ') t FROM documents),
        r AS (SELECT doc_id,
          regexp_matches(text, '[.!?]$$') AS r_terminal,
          len(t) >= 10 AS r_min_words,
          len(list_filter(t, x -> length(x) > 20)) = 0 AS r_word_len,
          len(list_filter(t, x -> list_contains(${sqlList(Stop)}, x))) > 0 AS r_stopword
         FROM d)
        SELECT doc_id, r_terminal, r_min_words, r_word_len, r_stopword,
          r_terminal AND r_min_words AND r_word_len AND r_stopword AS keep
        FROM r""")
    ),

    // ── Deterministic stratified sampling — the mixture-control pass of a
    //    training-data pipeline. The sampling decision is a pure function
    //    of the row key (md5-derived bucket), so samples are reproducible
    //    across runs/engines/partitionings (no RNG, no seed plumbing),
    //    refreshable (changing a rate re-uses prior decisions), and
    //    oracle-checkable. Per-stratum rates: 20% of 'en', 60% of the
    //    rest — the downsample-majority / keep-minority shape.
    QueryDef(
      "q64_stratified_sample",
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), col("lang"), col("source"))
          .withColumn("bucket", pmod(hash32(col("doc_id").cast(StringType)), lit(5)))
          .where(when(col("lang") === "en", col("bucket") < 1).otherwise(col("bucket") < 3))
          .select("doc_id", "lang", "source"),
      Some("""WITH b AS (SELECT doc_id, lang, source,
          ('0x'||substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 5 AS bucket FROM documents)
        SELECT doc_id, lang, source FROM b
        WHERE CASE WHEN lang = 'en' THEN bucket < 1 ELSE bucket < 3 END""")
    ),

    // ── Vocabulary-coverage quality filter: fraction of a document's
    //    tokens (with multiplicity) that fall in the corpus's top-1000
    //    vocabulary — the cheap gibberish/OOV screen that runs before
    //    model-based quality scoring. The vocabulary is a TakeOrdered
    //    top-K (per-partition heaps, deterministic count-then-word
    //    tie-break) and BROADCASTS to the coverage join, so the corpus
    //    shuffles once (the per-doc count) at any scale. Coverage is an
    //    int/int double — exact in both engines.
    QueryDef(
      "q95_vocab_coverage",
      (s, d) => {
        val words = docs(s, d).select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w").asc).limit(1000)
          .select(col("w"), lit(1L).as("inv"))
        words.join(broadcast(vocab), Seq("w"), "left_outer")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"),
            sum(coalesce(col("inv"), lit(0L))).as("n_vocab"))
          .withColumn("coverage",
            col("n_vocab").cast(DoubleType) / col("n_tok").cast(DoubleType))
      },
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) w FROM documents),
        v AS (SELECT w, 1 inv FROM (SELECT w, count(*) c FROM w GROUP BY 1
              ORDER BY c DESC, w ASC LIMIT 1000))
        SELECT doc_id, count(*)::BIGINT AS n_tok,
          CAST(sum(coalesce(inv, 0)) AS BIGINT) AS n_vocab,
          CAST(sum(coalesce(inv, 0)) AS DOUBLE) / count(*)::DOUBLE AS coverage
        FROM w LEFT JOIN v USING (w) GROUP BY doc_id""")
    ),

    // ── BM25 retrieval (rational-IDF variant): top-10 documents for a
    //    fixed conjunctive term set, scored with the BM25 tf saturation
    //    (k1=1.2, b=0.75) but the RAW Robertson idf ratio
    //    (N−df+0.5)/(df+0.5) instead of its log — log is not bit-portable
    //    across engines (NOTES discipline), and the scoring contract is
    //    declared as this deterministic variant. Every per-term factor is
    //    an element-wise IEEE double and the 3-term sum is written in
    //    literal fixed order, so both engines compute identical bits.
    //    Plan shape: ONE stats aggregate (N, total tokens, per-term dfs)
    //    broadcast into a per-row scoring pass — no explode, no join on
    //    terms — then TakeOrdered top-10. At 100 TB: one corpus
    //    aggregation + one narrow scan, score work O(terms) per doc.
    QueryDef(
      "q97_bm25",
      (s, d) => {
        val terms = Seq("vector", "merge", "filter")
        val base = docs(s, d).select(col("doc_id"), tokens(col("text")).as("t"))
        val aggCols = count(lit(1)).cast(LongType).as("n_docs") +:
          sum(size(col("t")).cast(LongType)).as("n_toks") +:
          terms.map(tm =>
            sum(when(array_contains(col("t"), tm), 1L).otherwise(0L)).as(s"df_$tm"))
        val stats = base.agg(aggCols.head, aggCols.tail: _*)
        val scored = base.crossJoin(broadcast(stats))
        val len = size(col("t")).cast(DoubleType)
        val avglen = col("n_toks").cast(DoubleType) / col("n_docs").cast(DoubleType)
        def termScore(tm: String) = {
          val tf = size(filter(col("t"), x => x === tm)).cast(DoubleType)
          val idf = (col("n_docs").cast(DoubleType) - col(s"df_$tm").cast(DoubleType) + lit(0.5)) /
            (col(s"df_$tm").cast(DoubleType) + lit(0.5))
          idf * (tf * lit(2.2)) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * len / avglen))
        }
        scored
          .select(col("doc_id"),
            terms.map(termScore).reduce(_ + _).as("score"))
          .where(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(10)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        st AS (SELECT count(*)::BIGINT n_docs, CAST(sum(len(t)) AS BIGINT) n_toks,
          CAST(sum(CASE WHEN list_contains(t,'vector') THEN 1 ELSE 0 END) AS BIGINT) df_vector,
          CAST(sum(CASE WHEN list_contains(t,'merge') THEN 1 ELSE 0 END) AS BIGINT) df_merge,
          CAST(sum(CASE WHEN list_contains(t,'filter') THEN 1 ELSE 0 END) AS BIGINT) df_filter
         FROM d),
        sc AS (SELECT doc_id,
          ((n_docs::DOUBLE - df_vector::DOUBLE + 0.5)/(df_vector::DOUBLE + 0.5))
            * (len(list_filter(t, x -> x = 'vector'))::DOUBLE * 2.2)
            / (len(list_filter(t, x -> x = 'vector'))::DOUBLE
               + 1.2*(0.25 + 0.75*len(t)::DOUBLE/(n_toks::DOUBLE/n_docs::DOUBLE)))
          + ((n_docs::DOUBLE - df_merge::DOUBLE + 0.5)/(df_merge::DOUBLE + 0.5))
            * (len(list_filter(t, x -> x = 'merge'))::DOUBLE * 2.2)
            / (len(list_filter(t, x -> x = 'merge'))::DOUBLE
               + 1.2*(0.25 + 0.75*len(t)::DOUBLE/(n_toks::DOUBLE/n_docs::DOUBLE)))
          + ((n_docs::DOUBLE - df_filter::DOUBLE + 0.5)/(df_filter::DOUBLE + 0.5))
            * (len(list_filter(t, x -> x = 'filter'))::DOUBLE * 2.2)
            / (len(list_filter(t, x -> x = 'filter'))::DOUBLE
               + 1.2*(0.25 + 0.75*len(t)::DOUBLE/(n_toks::DOUBLE/n_docs::DOUBLE)))
          AS score
         FROM d CROSS JOIN st)
        SELECT doc_id, score FROM sc WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 10""")
    ),

    // ── Fingerprint-overlap near-dup pairs (MOSS-style): docs sharing ≥ 5
    //    winnowed fingerprints. Candidate generation is an equi-join on
    //    the fingerprint value; fingerprints appearing in > 50 documents
    //    (boilerplate) are dropped FIRST — the stop-fingerprint guard that
    //    bounds any single join bucket at corpus scale, exactly like
    //    PPJoin's rare-prefix discipline. One join + one count aggregate.
    QueryDef(
      "q61_dedup_fingerprint",
      (s, d) => {
        val fps = winnowedFingerprints(docs(s, d)).select(col("doc_id"), col("fp")).cache()
        val dfreq = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        val rare = fps.join(dfreq.where(col("df") <= 50).select(col("fp")), "fp")
        val a = rare.select(col("doc_id").as("id_a"), col("fp"))
        val b = rare.select(col("doc_id").as("id_b"), col("fp"))
        a.join(b, Seq("fp"))
          .where(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("shared"))
          .where(col("shared") >= 5)
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        g AS (SELECT doc_id,
          list_transform(list_transform(range(0, len(t)-3), j -> t[j+1]||' '||t[j+2]||' '||t[j+3]||' '||t[j+4]),
                         x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P) gh
         FROM d WHERE len(t) >= 4),
        wn AS (SELECT doc_id,
          CASE WHEN len(gh) >= 5
               THEN list_transform(range(0, len(gh)-4), j -> list_aggregate(list_slice(gh, j+1, j+5), 'min'))
               ELSE gh END mins
         FROM g),
        fps AS (SELECT DISTINCT doc_id, unnest(mins) fp FROM wn),
        rare AS (SELECT doc_id, fp FROM fps
                 WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50))
        SELECT a.doc_id id_a, b.doc_id id_b, count(*) AS shared
        FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 5""")
    ),

    // ── TextRank keyword extraction: PageRank over the word-adjacency
    //    graph (undirected = symmetrized edges, self-loops dropped), five
    //    power-iteration rounds in integer MICRO-UNITS — rank₀ = 10⁶,
    //    rankₜ₊₁(v) = 150000 + 17·(Σᵤ→ᵥ rankₜ(u) div deg(u)) div 20 — so
    //    every engine computes bit-identical values (damping 0.85 as the
    //    rational 17/20, truncating division, exact long sums; no float
    //    ever). Each round is one equi-join + hash aggregate on the edge
    //    list — the canonical distributed-PageRank shape; the edge list and
    //    degree join are cached once and reused by all rounds. Every node
    //    has in-degree ≥ 1 by symmetry, so no dangling-mass term is needed.
    QueryDef(
      "q105_textrank",
      (s, d) => {
        val base = docs(s, d).select(tokens(col("text")).as("toks"))
        val e0 = base.select(explode(shingles(col("toks"), 2)).as("b"))
          .select(substring_index(col("b"), " ", 1).as("u"),
            substring_index(col("b"), " ", -1).as("v"))
          .where(col("u") =!= col("v"))
        // cache e: deg AND ed both consume it — uncached, the corpus
        // tokenize+distinct runs twice (once under each)
        val e = e0.union(e0.select(col("v").as("u"), col("u").as("v"))).distinct().cache()
        val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        val ed = e.join(deg, "u").cache() // (u, v, deg u) — reused every round
        var ranks = deg.select(col("u").as("w"), lit(1000000L).as("r"))
        for (_ <- 1 to 5) {
          ranks = ed.join(ranks, col("u") === col("w"))
            .groupBy(col("v"))
            .agg(sum(expr("r div d")).as("s"))
            .selectExpr("v AS w", "150000L + (17L * s) div 20 AS r")
            // truncated lineage per round (vocab-sized rows) — without it
            // the final action re-analyzes a plan nesting all five rounds
            // (the q113/q140 iterative-plan discipline)
            .localCheckpoint(false)
        }
        ranks
          .orderBy(col("r").desc, col("w").asc)
          .limit(20)
          .select(col("w").as("word"), col("r").as("rank"))
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""r$i AS (SELECT e.v w, 150000 + (17 * sum(p.r // deg.d)) // 20 r
          FROM e JOIN r${i - 1} p ON e.u = p.w JOIN deg ON deg.u = e.u GROUP BY e.v)"""
        }.mkString(",\n        ")
        s"""WITH t AS (SELECT string_split(text, ' ') t FROM documents),
        adj AS (SELECT t[j+1] u, t[j+2] v
                FROM (SELECT t, unnest(range(0, len(t)-1)) j FROM t WHERE len(t) >= 2)),
        e0 AS (SELECT u, v FROM adj WHERE u <> v),
        e AS (SELECT DISTINCT u, v FROM
                (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0)),
        deg AS (SELECT u, count(*)::BIGINT d FROM e GROUP BY 1),
        r0 AS (SELECT u w, 1000000::BIGINT r FROM deg),
        $iters
        SELECT w AS word, CAST(r AS BIGINT) AS rank FROM r5
        ORDER BY r DESC, w ASC LIMIT 20"""
      }
    ),

    // ── BPE tokenizer training: 5 merge rounds over the corpus vocabulary.
    //    The ONLY corpus-sized step is the word-count aggregate (map-side
    //    combine); every round after that is vocab-sized — pair counting is
    //    a hash aggregate over the (tiny, cached) vocab, the winning pair
    //    is a deterministic TakeOrdered top-1 (count desc, then lexicographic
    //    a, b), and the merge is applied per word by an `aggregate` HOF fold
    //    implementing exact greedy left-to-right BPE (pending-symbol
    //    accumulator: merge consumes both symbols, scanning resumes AFTER
    //    the merged token — handles overlapping pair runs like "a b a b"
    //    correctly). This is how BPE training scales to 100 TB: the corpus
    //    collapses to (word, count) once, and the iterative part never
    //    touches the corpus again. The DuckDB oracle replays each round's
    //    fold bit-for-bit with a recursive CTE walking word positions.
    QueryDef(
      "q113_bpe_train",
      (s, d) => {
        var vocab = docs(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) > 0)
          .groupBy(col("word")).agg(count(lit(1)).as("wn"))
          .withColumn("syms",
            expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          // localCheckpoint, not cache: caching stops re-EXECUTION but the
          // plan still nests one full round per iteration — the analyzer
          // walked a 1,160-line tree at the final action (r18 plan audit;
          // the q140/q184 iterative-plan blowup, same fix). Each round's
          // vocab/top are vocab-sized/1-row — O(vocab) state, same rows.
          .localCheckpoint(false)
        var merges: org.apache.spark.sql.DataFrame = null
        for (r <- 1 to 5) {
          val pairs = vocab.where(size(col("syms")) > 1)
            .select(col("wn"), explode(expr(
              "transform(sequence(1, size(syms)-1), i -> named_struct('a', syms[i-1], 'b', syms[i]))")).as("p"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum(col("wn")).as("pn"))
          val top = pairs.orderBy(col("pn").desc, col("a").asc, col("b").asc).limit(1)
            .select(lit(r).as("round"), col("a"), col("b"), col("pn"))
            .localCheckpoint(false) // consumed twice: merges union + the merge fold
          merges = if (merges == null) top else merges.union(top)
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
        merges
      },
      Some {
        val rounds = (1 to 5).map { r =>
          val prev = s"vocab${r - 1}"
          s"""pairs$r AS (SELECT syms[i] a, syms[i+1] b, sum(wn)::BIGINT pn
          FROM $prev, unnest(generate_series(1, len(syms)-1)) t(i)
          GROUP BY 1,2),
        top$r AS (SELECT $r::INT round, a, b, pn FROM pairs$r ORDER BY pn DESC, a, b LIMIT 1),
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
        $rounds
        SELECT round, a, b, pn FROM top1 UNION ALL SELECT round, a, b, pn FROM top2
        UNION ALL SELECT round, a, b, pn FROM top3 UNION ALL SELECT round, a, b, pn FROM top4
        UNION ALL SELECT round, a, b, pn FROM top5"""
      }
    ),

    // ── Intra-document repetition gate (Gopher-style quality rules,
    //    Rae et al. 2021 §A1.1, adapted to word level): per document the
    //    duplicate-word fraction (1 − distinct/total) and the share of
    //    bigram slots taken by the single most frequent bigram — the two
    //    signals that catch boilerplate and degenerate repetition that
    //    plain length/stopword scores (q31) miss. Per-source readout:
    //    failure counts at the ppm thresholds + integer mean ppms.
    //    Plan discipline: the whole computation is per-ROW array HOFs over
    //    staged attributes (`t`, `sbg` projected first — the winnowing
    //    inlining lesson), so the query is a narrow projection chain into
    //    ONE hash aggregate: zero shuffles before the final per-source
    //    combine. The top-bigram multiplicity is the longest RUN in the
    //    SORTED bigram array — one O(n log n) sort + one linear fold per
    //    row (the distinct×filter form is O(n²) per doc and would stall a
    //    task on one long unique-bigram document; r6 review finding).
    QueryDef(
      "q185_repetition_quality",
      (s, d) => {
        val t = docs(s, d)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
          .where(size(col("t")) >= 2)
        val staged = t.select(col("source"),
          size(col("t")).cast(LongType).as("nw"),
          size(array_distinct(col("t"))).cast(LongType).as("nd"),
          array_sort(graft.functions.TextFunctions.shingles(col("t"), 2)).as("sbg"))
        val m = staged.select(col("source"), col("nw"), col("nd"),
          expr("""aggregate(sbg,
              named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
              (acc, x) -> named_struct(
                'prev', x,
                'run', IF(acc.prev <=> x, acc.run + 1L, 1L),
                'best', GREATEST(acc.best, IF(acc.prev <=> x, acc.run + 1L, 1L))),
              acc -> acc.best)""")
            .cast(LongType).as("top_bg"))
        m.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(expr("(nw - nd) * 1000000 div nw") > 500000L, 1L).otherwise(0L)).as("n_fail_dup"),
          sum(when(expr("top_bg * 1000000 div (nw - 1)") > 100000L, 1L).otherwise(0L)).as("n_fail_bigram"),
          expr("sum((nw - nd) * 1000000 div nw) div count(1)").as("mean_dup_ppm"),
          expr("sum(top_bg * 1000000 div (nw - 1)) div count(1)").as("mean_topbg_ppm"))
      },
      Some("""WITH t AS (SELECT doc_id, source, string_split(text, ' ') t FROM documents),
        b0 AS (SELECT doc_id, source, len(t)::BIGINT nw,
                 len(list_distinct(t))::BIGINT nd,
                 list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) bg
               FROM t WHERE len(t) >= 2),
        u AS (SELECT doc_id, source, nw, nd, unnest(bg) x FROM b0),
        c AS (SELECT doc_id, source, nw, nd, x, count(*)::BIGINT cnt
              FROM u GROUP BY doc_id, source, nw, nd, x),
        m AS (SELECT source, nw, nd, max(cnt)::BIGINT top_bg
              FROM c GROUP BY doc_id, source, nw, nd)
        SELECT source, count(*)::BIGINT n_docs,
          sum(CASE WHEN (nw - nd) * 1000000 // nw > 500000 THEN 1 ELSE 0 END)::BIGINT n_fail_dup,
          sum(CASE WHEN top_bg * 1000000 // (nw - 1) > 100000 THEN 1 ELSE 0 END)::BIGINT n_fail_bigram,
          CAST(sum((nw - nd) * 1000000 // nw) // count(*) AS BIGINT) mean_dup_ppm,
          CAST(sum(top_bg * 1000000 // (nw - 1)) // count(*) AS BIGINT) mean_topbg_ppm
        FROM m GROUP BY source""")
    ),

    // ── Model-based quality classifier (the CCNet/fastText-style scorer —
    //    the one standard curation stage q31's hand rules don't cover, r6
    //    verdict Next #4): a self-trained multinomial Naive-Bayes-style
    //    token vote. The WEAK LABEL is the deterministic q85 rule gauntlet
    //    (length ≥ 10, no 20+-char token, has a stopword); training is one
    //    hash aggregate over exploded tokens giving each token its
    //    smoothed positive-class rate in exact integer ppm, w_ppm =
    //    (c_pos+1)·10⁶ div (c_all+2) (logs are not bit-portable across
    //    engines — NOTES discipline — so the vote averages rates, not
    //    log-odds); scoring is one equi-join token→w_ppm + a per-doc
    //    aggregate, score = mean w_ppm by integer division. At 100 TB:
    //    train = one shuffle of (token, counts) pairs, score = one
    //    shuffle-on-token join — never a per-doc loop, no UDFs, no model
    //    object to ship. The classifier gate (score ≥ 0.5) is exactly the
    //    shape q85's curation pipeline composes as an extra `.where`.
    QueryDef(
      "q191_quality_classifier",
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .withColumn("lb",
            (size(col("t")) >= 10 &&
              size(filter(col("t"), x => length(x) > 20)) === 0 &&
              size(filter(col("t"), x => x.isin(Stop: _*))) > 0).cast("long"))
        val tok = base.select(col("doc_id"), col("lb"), explode(col("t")).as("w"))
        val weights = tok.groupBy(col("w"))
          .agg(sum(col("lb")).as("c_pos"), count(lit(1)).as("c_all"))
          .select(col("w"), expr("((c_pos + 1) * 1000000) div (c_all + 2)").as("w_ppm"))
        tok.join(weights, "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            expr("sum(w_ppm) div count(1)").as("score_ppm"))
          .select(col("doc_id"), col("n_tokens"), col("score_ppm"),
            (col("score_ppm") >= 500000L).as("keep"))
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        lab AS (SELECT doc_id, t,
          CASE WHEN len(t) >= 10
                AND len(list_filter(t, x -> length(x) > 20)) = 0
                AND len(list_filter(t, x -> list_contains(${sqlList(Stop)}, x))) > 0
               THEN 1 ELSE 0 END lb FROM d),
        tok AS (SELECT doc_id, lb, unnest(t) w FROM lab),
        wt AS (SELECT w, CAST(((sum(lb) + 1) * 1000000) // (count(*) + 2) AS BIGINT) w_ppm
               FROM tok GROUP BY 1)
        SELECT doc_id, count(*)::BIGINT n_tokens,
          CAST(sum(w_ppm) // count(*) AS BIGINT) score_ppm,
          (sum(w_ppm) // count(*)) >= 500000 AS keep
        FROM tok JOIN wt USING (w) GROUP BY doc_id""")
    )
  )
}
