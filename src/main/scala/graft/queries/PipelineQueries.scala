package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-3 training-data-pipeline surface: corpus balancing, PII
  * redaction, sequence packing, repetition metrics, count-min sketch,
  * context-window chunking, and int8 embedding quantization.
  *
  * Same discipline as the rest of the query surface: pure Column programs
  * (codegen-friendly), engine-portable md5-derived hashing so every
  * stochastic-looking decision is a deterministic function of the row, and
  * floats only where both engines compute bit-identical IEEE doubles
  * (element-wise ops + order-independent MIN/MAX/COUNT, or integer-exact
  * sums — never an unordered float sum).
  */
object PipelineQueries {

  private val P = graft.functions.TextFunctions.HashPrime
  private val Stop = TextQueries.Stop
  private def sqlList(xs: Seq[String]) = TextQueries.sqlList(xs)

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "embeddings")

  val defs: Seq[QueryDef] = Seq(

    // ── Language-balanced quota sampling: at most N docs per language,
    //    chosen by hashed order (not doc_id order, which would bias toward
    //    old documents). The quota variant of q64's rate sampling — what a
    //    mixture spec like "cap zh at 30k docs" compiles to. Two-phase
    //    top-K: a global per-lang rank would shuffle every row of a
    //    language into one task, so phase 1 keeps each (lang, shard)'s
    //    local top-30 (fully parallel) and phase 2 ranks only the ≤
    //    30×shards survivors per language — identical result (a doc in the
    //    global top-30 is necessarily in its shard's top-30), bounded
    //    final window.
    QueryDef(
      "q76_lang_quota",
      (s, d) => {
        val h = pmod(hash32(concat(lit("q76|"), col("doc_id").cast(StringType))), lit(P))
        val shard = floor(col("doc_id") / lit(100000.0)).cast(LongType)
        val local = Window.partitionBy(col("lang"), col("shard")).orderBy(col("h").asc, col("doc_id").asc)
        val global = Window.partitionBy(col("lang")).orderBy(col("h").asc, col("doc_id").asc)
        docs(s, d)
          .select(col("doc_id"), col("lang"), h.as("h"), shard.as("shard"))
          .withColumn("lrk", row_number().over(local))
          .where(col("lrk") <= 30)
          .withColumn("rk", row_number().over(global))
          .where(col("rk") <= 30)
          .select(col("doc_id"), col("lang"), col("rk"))
      },
      Some(s"""WITH r AS (SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang
            ORDER BY ('0x'||substr(md5('q76|'||doc_id::VARCHAR),1,8))::BIGINT % $P, doc_id) rk
        FROM documents)
        SELECT doc_id, lang, rk FROM r WHERE rk <= 30""")
    ),

    // ── PII redaction: email + long-digit-run scrub with per-doc match
    //    counts — the compliance pass every published corpus runs. RE2-safe
    //    patterns (no backrefs/lookaround) so Spark's java.util.regex and
    //    the oracle's RE2 agree; the redacted text is compared by hash.
    QueryDef(
      "q77_pii_redact",
      (s, d) => {
        val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
        val numPat = "[0-9]{7,}"
        val redacted = regexp_replace(
          regexp_replace(col("text"), emailPat, "<EMAIL>"), numPat, "<NUM>")
        docs(s, d).select(
          col("doc_id"),
          md5(redacted).as("redacted_hash"),
          size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).cast(LongType).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(numPat), lit(0))).cast(LongType).as("n_longnums")
        )
      },
      Some("""SELECT doc_id,
          md5(regexp_replace(regexp_replace(text,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '[0-9]{7,}', '<NUM>', 'g')) AS redacted_hash,
          len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_emails,
          len(regexp_extract_all(text, '[0-9]{7,}'))::BIGINT AS n_longnums
        FROM documents""")
    ),

    // ── Greedy sequence packing: documents packed in order into
    //    fixed-token-budget training sequences (budget 256; a doc starts a
    //    new sequence when the running total crosses the boundary — the
    //    deterministic first-fit-in-order rule). Packed per language so the
    //    window has partition parallelism; a 100 TB run packs per shard
    //    key exactly like this.
    QueryDef(
      "q78_sequence_pack",
      (s, d) => {
        // The window is keyed by (lang, shard): lang alone has a handful
        // of distinct values, so a per-lang running sum would serialize
        // into that many tasks at corpus scale. Sequences never cross a
        // 100k-doc shard (the production contract: packing is shard-local),
        // and seq_id embeds the shard via a 2^32 stride so per-shard
        // sequence counters (≤ 100k docs · tokens/256 each, far below 2^32)
        // can never overflow into the next shard's id range. At test scale
        // every doc is in shard 0, so the shard key is exactly invisible to
        // the oracle while bounding window partitions at 10^5 docs forever.
        val shard = floor(col("doc_id") / lit(100000.0)).cast(LongType)
        val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs(s, d)
          .select(col("doc_id"), col("lang"), shard.as("shard"),
            size(tokens(col("text"))).cast(LongType).as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("seq_id",
            (col("shard") * lit(4294967296L) +
              floor((col("cum") - col("n_tok")) / lit(256.0)).cast(LongType)).as("seq_id"))
          .groupBy(col("lang"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, floor(doc_id / 100000.0)::BIGINT shard,
          len(string_split(text,' '))::BIGINT n FROM documents),
        c AS (SELECT doc_id, lang, shard, n,
          sum(n) OVER (PARTITION BY lang, shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM d)
        SELECT lang, shard * 4294967296 + floor((cum - n) / 256.0)::BIGINT AS seq_id,
          count(*)::BIGINT AS n_docs, CAST(sum(n) AS BIGINT) AS seq_tokens
        FROM c GROUP BY 1, 2""")
    ),

    // ── Intra-document repetition metrics (the Gopher-style rep filters):
    //    duplicate-word fraction, top-word fraction, duplicate-bigram
    //    fraction. All ratios are int/int divisions in doubles — exact and
    //    engine-identical. Narrow per-doc aggregation, no corpus-wide
    //    state.
    QueryDef(
      "q79_repetition",
      (s, d) => {
        // Pure per-row array program — the metrics are per-document, so no
        // explode/groupBy/join is warranted: zero shuffles at any corpus
        // size (PlanSpec-pinned). The top-word count is O(tokens×distinct)
        // per row, bounded by document length, not corpus size.
        val base = docs(s, d).select(col("doc_id"), tokens(col("text")).as("toks"))
        val staged = base.select(col("doc_id"), col("toks"),
          size(col("toks")).as("n"),
          array_distinct(col("toks")).as("uniq_toks"),
          graft.functions.HashExpressions.shingleHash32(col("toks"), 2).as("gh"))
        staged.select(
          col("doc_id"),
          (lit(1.0) - size(col("uniq_toks")).cast(DoubleType) / col("n").cast(DoubleType))
            .as("dup_word_frac"),
          (array_max(transform(col("uniq_toks"),
            w => size(filter(col("toks"), x => x === w)))).cast(DoubleType) / col("n").cast(DoubleType))
            .as("top_word_frac"),
          when(size(col("gh")) > 0,
            lit(1.0) - size(array_distinct(col("gh"))).cast(DoubleType) / size(col("gh")).cast(DoubleType))
            .otherwise(lit(0.0)).as("dup_bigram_frac"))
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        g AS (SELECT doc_id, t, CASE WHEN len(t) >= 2
              THEN list_transform(list_transform(range(0, len(t)-1), j -> t[j+1]||' '||t[j+2]),
                                  x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P)
              ELSE [] END gh FROM d)
        SELECT doc_id,
          CAST(1 AS DOUBLE) - len(list_distinct(t))::DOUBLE / len(t)::DOUBLE AS dup_word_frac,
          list_max(list_transform(list_distinct(t), w -> len(list_filter(t, x -> x = w))))::DOUBLE
            / len(t)::DOUBLE AS top_word_frac,
          CASE WHEN len(gh) > 0
            THEN CAST(1 AS DOUBLE) - len(list_distinct(gh))::DOUBLE / len(gh)::DOUBLE
            ELSE CAST(0 AS DOUBLE) END AS dup_bigram_frac
        FROM g""")
    ),

    // ── Count-min sketch over corpus word frequencies: depth 2 (the two
    //    independent md5-derived hashes), width 512, estimate = min over
    //    rows — with the exact count as companion and the CMS guarantee
    //    (estimate never undercounts) as a pinned-TRUE column, the q36
    //    sketch-gating pattern. The corpus is tokenized and shuffled ONCE
    //    (the exact word-count aggregation); both sketch rows are then
    //    derived from that distinct-word table — a cell count is just
    //    sum(exact_n) grouped by the cell hash — as partition windows, so
    //    the whole build is one linear plan with no self-join and no cache.
    QueryDef(
      "q80_countmin",
      (s, d) => {
        val words = docs(s, d)
          .select(explode(tokens(col("text"))).as("w"))
        val cells = words.groupBy(col("w")).agg(count(lit(1)).as("exact_n"))
          .select(col("w"), col("exact_n"),
            pmod(hash32(col("w")), lit(512)).as("c0"),
            pmod(hash32b(col("w")), lit(512)).as("c1"))
        cells
          .withColumn("n0", sum(col("exact_n")).over(Window.partitionBy(col("c0"))))
          .withColumn("n1", sum(col("exact_n")).over(Window.partitionBy(col("c1"))))
          .select(col("w"), col("exact_n"),
            least(col("n0"), col("n1")).as("cms_est"))
          .withColumn("est_ge_exact", col("cms_est") >= col("exact_n"))
          .orderBy(col("exact_n").desc, col("w"))
          .limit(20)
      },
      Some("""WITH w AS (SELECT unnest(string_split(text,' ')) w FROM documents),
        exact AS (SELECT w, count(*) exact_n FROM w GROUP BY 1),
        t0 AS (SELECT ('0x'||substr(md5(w),1,8))::BIGINT % 512 c0, count(*) n0 FROM w GROUP BY 1),
        t1 AS (SELECT ('0x'||substr(md5(w),9,8))::BIGINT % 512 c1, count(*) n1 FROM w GROUP BY 1)
        SELECT w, exact_n, least(n0, n1) AS cms_est, least(n0, n1) >= exact_n AS est_ge_exact
        FROM exact
        JOIN t0 ON ('0x'||substr(md5(w),1,8))::BIGINT % 512 = c0
        JOIN t1 ON ('0x'||substr(md5(w),9,8))::BIGINT % 512 = c1
        ORDER BY exact_n DESC, w LIMIT 20""")
    ),

    // ── Boilerplate removal at chunk granularity (the C4 move, on 64-char
    //    windows): a chunk appearing in >= 3 distinct documents is
    //    boilerplate; each document is reassembled from its kept chunks in
    //    order and compared by hash. Document-frequency is one equi-keyed
    //    aggregation; the rewrite is a per-doc ordered fold — no
    //    corpus-wide state beyond the chunk DF table.
    QueryDef(
      "q81_boilerplate",
      (s, d) => {
        // empty docs emit no chunks: Spark's (len-1)/64 double division
        // truncates toward zero (one empty chunk) while DuckDB's // floors
        // to -1 (no rows) — the explicit filter makes both sides agree.
        val chunks = docs(s, d)
          .where(length(col("text")) > 0)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0),
              ((length(col("text")) - lit(1)) / lit(64)).cast(IntegerType))).as("ix"))
          .select(col("doc_id"), col("ix"),
            expr("substring(text, ix * 64 + 1, 64)").as("chunk"))
        val dfreq = chunks.groupBy(col("chunk"))
          .agg(countDistinct(col("doc_id")).as("df"))
        chunks.join(dfreq, "chunk")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_boiler"),
            md5(array_join(
              transform(
                array_sort(collect_list(struct(col("ix"),
                  when(col("df") < 3, col("chunk")).otherwise(lit("")).as("kept")))),
                x => x.getField("kept")),
              "")).as("clean_hash"))
      },
      Some("""WITH ch AS (SELECT doc_id, ix, substr(text, (ix*64+1)::INT, 64) chunk
          FROM (SELECT doc_id, text, unnest(range(0, (length(text)-1)//64 + 1)) ix
                FROM documents WHERE length(text) > 0)),
        dfreq AS (SELECT chunk, count(DISTINCT doc_id) df FROM ch GROUP BY 1)
        SELECT doc_id, count(*)::BIGINT AS n_chunks,
          CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
          md5(string_agg(CASE WHEN df < 3 THEN chunk ELSE '' END, '' ORDER BY ix)) AS clean_hash
        FROM ch JOIN dfreq USING (chunk) GROUP BY doc_id""")
    ),

    // ── Context-window chunking: each document split into fixed 64-char
    //    windows (the tail chunk short) — the standard pre-embedding
    //    chunker. One generate per doc, no shuffle; chunk identity by
    //    hash.
    QueryDef(
      "q82_chunking",
      (s, d) =>
        // same empty-text guard as q81 (Spark truncation vs DuckDB floor)
        docs(s, d)
          .where(length(col("text")) > 0)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0),
              ((length(col("text")) - lit(1)) / lit(64)).cast(IntegerType))).as("ix"))
          .select(col("doc_id"), col("ix").cast(LongType).as("chunk_ix"),
            expr("substring(text, ix * 64 + 1, 64)").as("chunk"))
          .select(col("doc_id"), col("chunk_ix"),
            md5(col("chunk")).as("chunk_hash"),
            length(col("chunk")).cast(LongType).as("chunk_len")),
      Some("""SELECT doc_id, ix AS chunk_ix,
          md5(substr(text, (ix * 64 + 1)::INT, 64)) AS chunk_hash,
          length(substr(text, (ix * 64 + 1)::INT, 64))::BIGINT AS chunk_len
        FROM (SELECT doc_id, text, unnest(range(0, (length(text)-1)//64 + 1)) ix
              FROM documents WHERE length(text) > 0)""")
    ),

    // ── Exact-K deterministic global sample: the K docs with the smallest
    //    keyed hash, corpus-wide — "give me exactly 100k docs,
    //    reproducibly" (rate sampling q64 gives a binomial count; quota
    //    q76 is per-group). ORDER BY hash LIMIT K plans as
    //    TakeOrderedAndProject: per-partition top-K then a driver merge of
    //    K-sized heaps — no global sort at any scale (PlanSpec-pinned).
    QueryDef(
      "q84_exact_k_sample",
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), col("lang"), col("source"))
          .withColumn("h",
            pmod(hash32(concat(lit("q84|"), col("doc_id").cast(StringType))), lit(P)))
          .orderBy(col("h").asc, col("doc_id").asc)
          .limit(100)
          .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""SELECT doc_id, lang, source FROM documents
        ORDER BY ('0x'||substr(md5('q84|'||doc_id::VARCHAR),1,8))::BIGINT % $P, doc_id
        LIMIT 100""")
    ),

    // ── Collocation extraction: PMI-style association for adjacent word
    //    pairs WITHOUT log (log is not bit-portable across engines, NOTES
    //    discipline): score = (c_ab · N_tokens) / (c_a · c_b), the raw
    //    probability ratio PMI exponentiates — same ranking, exact BIGINT
    //    numerator/denominator, one deterministic double division at the
    //    end. Bigrams seen < 5 times are noise-floored out; top-20 by
    //    score with full tie-break.
    QueryDef(
      "q91_collocations",
      (s, d) => {
        val base = docs(s, d).select(tokens(col("text")).as("toks"))
        val uni = base.select(explode(col("toks")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val nTok = uni.agg(sum(col("c")).as("n"))
        val bi = base
          .select(explode(shingles(col("toks"), 2)).as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("c_ab"))
          .where(col("c_ab") >= 5)
          .select(col("b"), col("c_ab"),
            substring_index(col("b"), " ", 1).as("w1"),
            substring_index(col("b"), " ", -1).as("w2"))
        bi.join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
          .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
          .crossJoin(broadcast(nTok))
          .select(col("b").as("bigram"), col("c_ab"),
            // per-operand double casts BEFORE multiplying: the integer
            // product c_ab·N overflows BIGINT at web scale, while each
            // count converts exactly to double (< 2^53) and the
            // multiply/divide are bit-identical IEEE in both engines
            (col("c_ab").cast(DoubleType) * col("n").cast(DoubleType) /
              (col("c_a").cast(DoubleType) * col("c_b").cast(DoubleType))).as("assoc"))
          .orderBy(col("assoc").desc, col("bigram").asc)
          .limit(20)
      },
      Some("""WITH t AS (SELECT string_split(text,' ') t FROM documents),
        uni AS (SELECT w, count(*) c FROM (SELECT unnest(t) w FROM t) GROUP BY 1),
        n AS (SELECT CAST(sum(c) AS BIGINT) n FROM uni),
        bi AS (SELECT b, count(*) c_ab FROM (
                 SELECT unnest(list_transform(range(0, len(t)-1), j -> t[j+1]||' '||t[j+2])) b
                 FROM t WHERE len(t) >= 2) GROUP BY 1 HAVING count(*) >= 5),
        sp AS (SELECT b, c_ab, string_split(b, ' ')[1] w1, string_split(b, ' ')[2] w2 FROM bi)
        SELECT b AS bigram, c_ab,
          c_ab::DOUBLE * n::DOUBLE / (ua.c::DOUBLE * ub.c::DOUBLE) AS assoc
        FROM sp JOIN uni ua ON ua.w = sp.w1
        JOIN uni ub ON ub.w = sp.w2
        CROSS JOIN n
        ORDER BY assoc DESC, bigram ASC LIMIT 20""")
    ),

    // ── The full curation pipeline as ONE declarative DAG — the composition
    //    a C4-style corpus build runs: rule gauntlet (q74) → normalized
    //    dedup keep-first (q75) → quality gate (q31's score) → hashed
    //    rate-sample (q64's mechanism) → per-(lang, source) corpus stats.
    //    Every stage is an already-oracle-proven building block; composing
    //    them stays one Catalyst plan (the gauntlet pushes down past the
    //    dedup join, the sample is a pure row predicate), so Spark
    //    pipelines the whole thing without materialization barriers.
    QueryDef(
      "q85_curation_pipeline",
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("text"),
            tokens(col("text")).as("t"))
        // q74's gauntlet minus the terminal-punctuation rule: the synthetic
        // corpus has no sentence punctuation, so that rule would empty the
        // pipeline (q74 still audits it as a column).
        val ruled = base.where(
          size(col("t")) >= 10 &&
            size(filter(col("t"), x => length(x) > 20)) === 0 &&
            size(filter(col("t"), x => x.isin(Stop: _*))) > 0)
          .withColumn("canon_hash",
            md5(graft.functions.CanonicalizeExpressions.canonAlnum(col("text"))))
        val keepers = ruled.groupBy(col("canon_hash")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val deduped = ruled.join(keepers, Seq("doc_id"), "left_semi")
        val nTok = size(col("t")).cast(DoubleType)
        val quality =
          lit(0.5) * (size(array_distinct(col("t"))).cast(DoubleType) / nTok) +
            lit(0.3) * least(
              aggregate(transform(col("t"), x => length(x).cast(LongType)), lit(0L), _ + _)
                .cast(DoubleType) / nTok / lit(8.0), lit(1.0)) +
            lit(0.2) * (size(filter(col("t"), x => x.isin(Stop: _*))).cast(DoubleType) / nTok)
        deduped
          .where(quality >= 0.5)
          .where(pmod(hash32(concat(lit("q85|"), col("doc_id").cast(StringType))), lit(5)) < 3)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(col("t")).cast(LongType)).as("n_tokens"))
      },
      Some(s"""WITH d AS (SELECT doc_id, lang, source, text, string_split(text,' ') t FROM documents),
        ruled AS (SELECT *,
            md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) canon_hash
          FROM d
          WHERE len(t) >= 10
            AND len(list_filter(t, x -> length(x) > 20)) = 0
            AND len(list_filter(t, x -> list_contains(${sqlList(Stop)}, x))) > 0),
        keepers AS (SELECT min(doc_id) doc_id FROM ruled GROUP BY canon_hash),
        deduped AS (SELECT * FROM ruled WHERE doc_id IN (SELECT doc_id FROM keepers)),
        scored AS (SELECT *,
            0.5 * (len(list_distinct(t))::DOUBLE / len(t)::DOUBLE)
          + 0.3 * least(CAST(list_reduce(list_prepend(0::BIGINT,
                list_transform(t, x -> length(x)::BIGINT)), (a,b) -> a+b) AS DOUBLE)
              / len(t)::DOUBLE / 8.0, 1.0)
          + 0.2 * (len(list_filter(t, x -> list_contains(${sqlList(Stop)}, x)))::DOUBLE / len(t)::DOUBLE)
            AS quality
          FROM deduped)
        SELECT lang, source, count(*)::BIGINT AS n_docs,
          CAST(sum(len(t)) AS BIGINT) AS n_tokens
        FROM scored
        WHERE quality >= 0.5
          AND ('0x'||substr(md5('q85|'||doc_id::VARCHAR),1,8))::BIGINT % 5 < 3
        GROUP BY 1, 2""")
    ),

    // ── Temperature-based mixture rebalancing (α = 0.5): the data-mixing
    //    pass that flattens a skewed language distribution before
    //    training — kept docs per language become ∝ sqrt(n_lang), with
    //    the SMALLEST language kept in full (normalizing by min(n) keeps
    //    every per-group rate in (0, 1] and, unlike a sum of floats, min
    //    is order-independent and exactly portable). keep decision =
    //    deterministic keyed hash < rate, so the sample is reproducible
    //    and refreshable (q64's discipline). Plan: two narrow corpus
    //    scans with BROADCAST rate/count dims — deliberately NOT a
    //    count-window over the corpus, which would shuffle every row on
    //    the (skewed by construction) language key.
    QueryDef(
      "q94_mixture_rebalance",
      (s, d) => {
        val g = docs(s, d).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        val nMin = g.agg(min(col("n_docs")).as("n_min"))
        val rates = g.crossJoin(broadcast(nMin))
          .select(col("lang"), col("n_docs"),
            sqrt(col("n_min").cast(DoubleType) / col("n_docs").cast(DoubleType)).as("keep_frac"))
        val kept = docs(s, d)
          .join(broadcast(rates.select(col("lang"), col("keep_frac"))), "lang")
          .where(pmod(hash32(concat(lit("q94|"), col("doc_id").cast(StringType))), lit(P))
            .cast(DoubleType) < col("keep_frac") * lit(P.toDouble))
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        rates.join(kept, Seq("lang"), "left_outer")
          .select(col("lang"), col("n_docs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("keep_frac"))
      },
      Some(s"""WITH g AS (SELECT lang, count(*) n FROM documents GROUP BY 1),
        m AS (SELECT min(n) n_min FROM g),
        r AS (SELECT lang, n, sqrt(n_min::DOUBLE / n::DOUBLE) frac FROM g CROSS JOIN m),
        k AS (SELECT d.lang, count(*) n_kept FROM documents d JOIN r USING (lang)
              WHERE (('0x'||substr(md5('q94|'||doc_id::VARCHAR),1,8))::BIGINT % $P)::DOUBLE
                    < frac * $P.0
              GROUP BY 1)
        SELECT r.lang, r.n::BIGINT AS n_docs, coalesce(k.n_kept, 0)::BIGINT AS n_kept,
          r.frac AS keep_frac
        FROM r LEFT JOIN k USING (lang)""")
    ),

    // ── Distributed global row numbering WITHOUT a single-partition sort:
    //    contiguous global ranks over (lang, doc_id) order, computed as
    //    shard-local row_number (fully parallel — the window partitions by
    //    (lang, 100k-doc shard), q78's discipline) plus a cumulative
    //    offset from the tiny (lang, shard) count table. The only
    //    single-partition stage is the offset cum-sum over #groups rows —
    //    a dimension, not the corpus. This is THE pattern for assigning
    //    stable example ids to a training corpus: a naive global
    //    row_number() window funnels 100 TB through one task.
    QueryDef(
      "q96_global_rank",
      (s, d) => {
        val shard = floor(col("doc_id") / lit(100000.0)).cast(LongType)
        val base = docs(s, d).select(col("doc_id"), col("lang"), shard.as("shard"))
        val counts = base.groupBy(col("lang"), col("shard")).agg(count(lit(1)).as("n"))
        val offW = Window.orderBy(col("lang"), col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = counts
          .withColumn("off", coalesce(sum(col("n")).over(offW), lit(0L)))
          .select(col("lang"), col("shard"), col("off"))
        val localW = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
        base
          .withColumn("lrn", row_number().over(localW))
          .join(broadcast(offsets), Seq("lang", "shard"))
          .select(col("doc_id"), col("lang"),
            (col("off") + col("lrn")).as("global_rn"))
      },
      Some("""SELECT doc_id, lang,
          row_number() OVER (ORDER BY lang, doc_id)::BIGINT AS global_rn
        FROM documents""")
    ),

    // ── Int8 symmetric embedding quantization: per-vector scale =
    //    max|x|/127, q_i = floor(x/scale + 0.5) (explicit half-up — both
    //    engines compute the identical IEEE double), integer-exact
    //    checksum over the quantized vector plus the max reconstruction
    //    error (MAX is order-independent, so it is oracle-safe where a
    //    float SUM would not be). The compression pass before ANN serving.
    QueryDef(
      "q83_embedding_quant",
      (s, d) => {
        val staged = emb(s, d).select(col("vec_id"), col("embedding").as("v"))
          .select(col("vec_id"), col("v"),
            array_max(transform(col("v"), x => abs(x.cast(DoubleType)))).as("maxabs"))
          .select(col("vec_id"), col("v"), col("maxabs"),
            (col("maxabs") / lit(127.0)).as("scale"))
        staged.select(
          col("vec_id"),
          col("scale"),
          when(col("maxabs") > 0,
            aggregate(
              transform(col("v"), x => floor(x.cast(DoubleType) / col("scale") + lit(0.5)).cast(LongType)),
              lit(0L), _ + _))
            .otherwise(lit(0L)).as("q_sum"),
          when(col("maxabs") > 0,
            array_max(transform(col("v"),
              x => abs(x.cast(DoubleType) - floor(x.cast(DoubleType) / col("scale") + lit(0.5)) * col("scale")))))
            .otherwise(lit(0.0)).as("max_q_err")
        )
      },
      Some("""WITH m AS (SELECT vec_id, embedding v,
          list_max(list_transform(embedding, x -> abs(x::DOUBLE))) maxabs
        FROM embeddings),
        s AS (SELECT vec_id, v, maxabs, maxabs / 127.0 scale FROM m)
        SELECT vec_id, scale,
          CASE WHEN maxabs > 0 THEN CAST(list_reduce(list_prepend(0::BIGINT,
              list_transform(v, x -> floor(x::DOUBLE / scale + 0.5)::BIGINT)), (a,b) -> a+b) AS BIGINT)
            ELSE 0 END AS q_sum,
          CASE WHEN maxabs > 0 THEN list_max(
              list_transform(v, x -> abs(x::DOUBLE - floor(x::DOUBLE / scale + 0.5) * scale)))
            ELSE CAST(0 AS DOUBLE) END AS max_q_err
        FROM s""")
    ),

    // ── Content-defined chunking (Rabin-style CDC): a cut lands after any
    //    16-char window whose rolling hash ≡ 0 (mod 64), so chunk
    //    boundaries are a pure function of CONTENT — insert one byte and
    //    only the chunk containing it changes, which is what makes CDC
    //    chunks dedup-stable where fixed-stride chunks (q82) all shift.
    //    One fused char-gram hash pass per doc (the q92 expression), cuts
    //    and spans derived array-side, then a single posexplode — per-doc
    //    work is linear in length, nothing shuffles until the output.
    QueryDef(
      "q102_cdc_chunking",
      (s, d) => {
        val k = 16
        val staged = docs(s, d).select(col("doc_id"), col("text"),
          graft.functions.HashExpressions.charGramHash32(col("text"), k).as("hs"))
        val cuts = filter(
          transform(col("hs"), (h, i) => when(pmod(h, lit(64)) === 0, i + lit(k)).otherwise(lit(-1))),
          c => c >= 0)
        // ascending by construction (index order); distinct only merges a
        // cut falling exactly at end-of-text with the closing bound
        val bounds = array_distinct(concat(array(lit(0)), cuts, array(length(col("text")))))
        val spans = when(size(col("bounds")) >= 2,
          transform(sequence(lit(0), size(col("bounds")) - 2),
            j => struct(element_at(col("bounds"), j + 1).as("start"),
              element_at(col("bounds"), j + 2).as("stop"))))
          .otherwise(array().cast("array<struct<start:int,stop:int>>"))
        staged
          .select(col("doc_id"), col("text"), bounds.as("bounds"))
          .select(col("doc_id"), col("text"), posexplode(spans))
          .select(col("doc_id"), col("pos").as("chunk_ix"),
            col("col.start").as("chunk_start"),
            (col("col.stop") - col("col.start")).as("chunk_len"),
            hash32(col("text").substr(col("col.start") + 1, col("col.stop") - col("col.start")))
              .as("chunk_hash"))
          .where(col("chunk_len") > 0)
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) len FROM documents),
        g AS (SELECT doc_id, i, ('0x'||substr(md5(substr(text, (i+1)::INT, 16)),1,8))::BIGINT h
              FROM (SELECT doc_id, text, len, unnest(range(0, greatest(len - 15, 0))) i FROM d)),
        cuts AS (SELECT doc_id, i + 16 cut FROM g WHERE h % 64 = 0),
        b AS (SELECT DISTINCT doc_id, cut FROM (
                SELECT doc_id, cut FROM cuts
                UNION ALL SELECT doc_id, 0 FROM d
                UNION ALL SELECT doc_id, len FROM d)),
        sp AS (SELECT doc_id, cut AS start,
                 lead(cut) OVER (PARTITION BY doc_id ORDER BY cut) stop
               FROM b)
        SELECT sp.doc_id, (row_number() OVER (PARTITION BY sp.doc_id ORDER BY start) - 1)::INT AS chunk_ix,
          start::INT AS chunk_start, (stop - start)::INT AS chunk_len,
          ('0x'||substr(md5(substr(d.text, (start+1)::INT, (stop-start)::INT)),1,8))::BIGINT AS chunk_hash
        FROM sp JOIN d ON sp.doc_id = d.doc_id
        WHERE stop IS NOT NULL AND stop > start""")
    ),

    // ── Deterministic train/val/test split: bucket = hash(salt|doc_id)
    //    mod 100 → 90/5/5. The assignment is a pure per-row function — no
    //    shuffle, no state, stable under corpus growth (a doc's split
    //    never changes when other docs arrive), which is the property that
    //    prevents silent train/test leakage across pipeline re-runs.
    QueryDef(
      "q103_hash_split",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          pmod(hash32(concat(lit("q103|"), col("doc_id").cast(StringType))), lit(100)).as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
            .otherwise("test").as("split")),
      Some("""SELECT doc_id, b AS bucket,
          CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                ('0x'||substr(md5('q103|'||doc_id::VARCHAR),1,8))::BIGINT % 100 AS b
              FROM documents)""")
    ),

    // ── DSIR-style importance weighting: hashed unigram features, weight
    //    w(f) = n_target(f)·10⁶ ÷ n_all(f) (integer — engine-exact), doc
    //    score = Σ w(f(token)) over its tokens; top-50 docs most
    //    target-like (target = English). ONE tokenize pass: the per-
    //    (doc, feature) count table feeds both the global feature counts
    //    (re-aggregate, carrying the per-doc lang) and the scoring join —
    //    the ≤2¹⁶-row weight table broadcasts, the final sum is a hash
    //    aggregate, and the top-50 is TakeOrdered (no global sort).
    QueryDef(
      "q104_importance_weights",
      (s, d) => {
        val toks = docs(s, d).select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
        val docFeat = toks
          .select(col("doc_id"), col("lang"), explode(col("toks")).as("w"))
          .select(col("doc_id"), col("lang"), pmod(hash32(col("w")), lit(65536)).as("f"))
          .groupBy(col("doc_id"), col("lang"), col("f"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(false)
        val weights = docFeat
          .groupBy(col("f"))
          .agg(sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("n_target"),
            sum(col("n")).as("n_all"))
          // integer `div`, not `/`: double division + cast can be off-by-one
          // on large quotients; DuckDB's `//` on positive BIGINTs matches div
          .selectExpr("f", "(n_target * 1000000L) div n_all AS wt")
        docFeat.join(broadcast(weights), "f")
          .groupBy(col("doc_id"))
          .agg(sum(col("n") * col("wt")).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(50)
      },
      Some("""WITH t AS (SELECT doc_id, lang,
            ('0x'||substr(md5(w),1,8))::BIGINT % 65536 AS f
          FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) w FROM documents)),
        df AS (SELECT doc_id, lang, f, count(*)::BIGINT n FROM t GROUP BY 1, 2, 3),
        wt AS (SELECT f, (sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) * 1000000) // sum(n) AS wt
               FROM df GROUP BY f)
        SELECT doc_id, sum(n * wt)::BIGINT AS score
        FROM df JOIN wt USING (f)
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 50""")
    ),

    // ── Leakage-aware train/val/test split: assignment keyed on the
    //    CONTENT hash (md5 of text), not the document id, so exact
    //    duplicates always land in the same split — the eval-contamination
    //    guard a naive id-keyed split silently violates. The readout
    //    computes BOTH regimes and their leakage (duplicate-text groups
    //    spanning >1 split): content-keyed is 0 by construction (the
    //    pinned invariant); id-keyed leaks whenever clones exist (visible
    //    at sf0.1, which carries 8 duplicate texts). One per-content-group
    //    aggregate → one summary row: two hash aggregates over narrow
    //    columns, the split itself never shuffles text. Buckets 0-7 train,
    //    8 val, 9 test (80/10/10).
    QueryDef(
      "q186_leakage_split",
      (s, d) => {
        val withSplits = docs(s, d).select(
          md5(col("text")).as("h"),
          pmod(graft.functions.TextFunctions.hash32(
            concat(lit("split|"), md5(col("text")))), lit(10)).as("cs"),
          pmod(graft.functions.TextFunctions.hash32(
            concat(lit("split|"), col("doc_id").cast(StringType))), lit(10)).as("ns"))
        val g = withSplits.groupBy(col("h")).agg(
          count(lit(1)).as("n"),
          min(col("cs")).as("gcs"),
          countDistinct(col("cs")).as("ncs"),
          countDistinct(col("ns")).as("nns"))
        g.agg(
          sum(col("n")).as("n_docs"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_groups"),
          sum(when(col("ncs") > 1, 1L).otherwise(0L)).as("leaky_groups_content"),
          sum(when(col("nns") > 1, 1L).otherwise(0L)).as("leaky_groups_naive"),
          sum(when(col("gcs") < 8, col("n")).otherwise(0L)).as("n_train"),
          sum(when(col("gcs") === 8, col("n")).otherwise(0L)).as("n_val"),
          sum(when(col("gcs") === 9, col("n")).otherwise(0L)).as("n_test"))
      },
      Some("""WITH w AS (SELECT md5(text) h,
                 ('0x'||substr(md5('split|'||md5(text)),1,8))::BIGINT % 10 cs,
                 ('0x'||substr(md5('split|'||doc_id::VARCHAR),1,8))::BIGINT % 10 ns
               FROM documents),
        g AS (SELECT h, count(*)::BIGINT n, min(cs)::BIGINT gcs,
                count(DISTINCT cs)::BIGINT ncs, count(DISTINCT ns)::BIGINT nns
              FROM w GROUP BY 1)
        SELECT sum(n)::BIGINT n_docs,
          sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT dup_groups,
          sum(CASE WHEN ncs > 1 THEN 1 ELSE 0 END)::BIGINT leaky_groups_content,
          sum(CASE WHEN nns > 1 THEN 1 ELSE 0 END)::BIGINT leaky_groups_naive,
          sum(CASE WHEN gcs < 8 THEN n ELSE 0 END)::BIGINT n_train,
          sum(CASE WHEN gcs = 8 THEN n ELSE 0 END)::BIGINT n_val,
          sum(CASE WHEN gcs = 9 THEN n ELSE 0 END)::BIGINT n_test
        FROM g""")
    ),

    // ── Training-mixture token budget by largest-remainder apportionment
    //    (Hamilton's method): allocate a 1M-token sampling budget across
    //    sources proportionally to their available whitespace tokens, in
    //    EXACT integers — floor shares first, then the leftover seats go
    //    to the largest remainders (ties by source asc). The mixture
    //    schedule every multi-source training run needs, with none of the
    //    float-rounding drift that makes proportional splits sum to
    //    budget±k. Corpus stage is ONE narrow per-source aggregate; the
    //    apportionment runs on #sources rows (the tiny-table
    //    single-partition window, q151's contract). Σalloc = budget is the
    //    pinned invariant.
    QueryDef(
      "q187_token_budget",
      (s, d) => {
        val budget = 1000000L
        val avail = docs(s, d)
          .select(col("source"), size(graft.functions.TextFunctions.tokens(col("text")))
            .cast(LongType).as("tok"))
          .groupBy(col("source")).agg(sum(col("tok")).as("w"))
        // the grand total comes from a window over the PER-SOURCE table
        // (#sources rows — the tiny-tier contract), NOT a second
        // aggregate of the corpus: a separate `avail.agg(sum)` subtree
        // would re-scan the documents table end to end (PlanSpec pins the
        // single corpus scan)
        val w2 = org.apache.spark.sql.expressions.Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // the quota product runs in DECIMAL(38,0) (the q171 discipline):
        // budget·w in int64 wraps once a source holds > ~9.2e12 tokens —
        // reachable at the 100 TB shape — while DECIMAL keeps it exact to
        // 10^32 tokens per source (r6 review finding)
        val staged = avail
          .withColumn("wt", sum(col("w")).over(w2))
          .select(col("source"), col("w"),
            expr(s"CAST((CAST(w AS DECIMAL(38,0)) * $budget) div wt AS BIGINT)").as("fl"),
            expr(s"CAST((CAST(w AS DECIMAL(38,0)) * $budget) % wt AS BIGINT)").as("rem"))
        val w1 = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("source").asc)
        staged
          .withColumn("rk", row_number().over(w1))
          .withColumn("deficit", lit(budget) - sum(col("fl")).over(w2))
          .select(col("source"), col("w").as("tokens_avail"), col("fl").as("floor_alloc"),
            when(col("rk") <= col("deficit"), 1L).otherwise(0L).as("extra"),
            (col("fl") + when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("alloc"))
      },
      Some("""WITH a AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT w
               FROM documents GROUP BY 1),
        t AS (SELECT sum(w)::BIGINT wt FROM a),
        st AS (SELECT source, w,
                 CAST((w::HUGEINT * 1000000) // (SELECT wt FROM t) AS BIGINT) fl,
                 CAST((w::HUGEINT * 1000000) % (SELECT wt FROM t) AS BIGINT) rem
               FROM a),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) rk,
                1000000 - (SELECT sum(fl) FROM st) deficit
              FROM st)
        SELECT source, w AS tokens_avail, fl AS floor_alloc,
          CAST(CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) extra,
          CAST(fl + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) alloc
        FROM r""")
    )
  )
}
