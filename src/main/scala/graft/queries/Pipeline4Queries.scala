package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 tranche five: vocabulary economics, hash-split auditing, and
  * quantized embedding geometry — the last-mile tooling around tokenizer
  * and split decisions.
  */
object Pipeline4Queries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "embeddings")

  val defs: Seq[QueryDef] = Seq(

    // ── Zipf coverage curve: for vocabulary frequency thresholds t = 2^b,
    //    how many word types survive and what share of corpus tokens they
    //    cover — the curve that decides a tokenizer's vocab size (the
    //    knee is where coverage stops paying for vocabulary). One word-
    //    count aggregate; words group into power-of-two frequency bands
    //    by length(bin(n)) (integer log2); the cumulative-from-the-top
    //    window runs over the ≤ 20-row band table. Corpus touched once.
    QueryDef(
      "q151_zipf_coverage",
      (s, d) => {
        val bands = docs(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) > 0)
          .groupBy(col("w")).agg(count(lit(1)).as("n"))
          .select(length(bin(col("n"))).cast(IntegerType).as("band"), col("n"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("vocab_in_band"), sum(col("n")).as("tokens_in_band"))
        val wdesc = Window.orderBy(col("band").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = bands.agg(sum(col("tokens_in_band")).as("nt"))
        bands
          .withColumn("vocab_size", sum(col("vocab_in_band")).over(wdesc))
          .withColumn("tokens_covered", sum(col("tokens_in_band")).over(wdesc))
          .crossJoin(broadcast(tot))
          .select(expr("CAST(pow(2, band - 1) AS BIGINT)").as("threshold"),
            col("vocab_size"), col("tokens_covered"),
            expr("(tokens_covered * 1000000) div nt").as("coverage_ppm"))
          .orderBy(col("threshold"))
      },
      Some("""WITH u AS (SELECT w, count(*)::BIGINT n FROM
                 (SELECT unnest(string_split(text, ' ')) w FROM documents)
               WHERE len(w) > 0 GROUP BY 1),
        bands AS (SELECT CAST(len(bin(n)) AS INT) band,
                    count(*)::BIGINT vocab_in_band, sum(n)::BIGINT tokens_in_band
                  FROM u GROUP BY 1),
        t AS (SELECT sum(tokens_in_band)::BIGINT nt FROM bands),
        c AS (SELECT band,
                sum(vocab_in_band) OVER (ORDER BY band DESC)::BIGINT vocab_size,
                sum(tokens_in_band) OVER (ORDER BY band DESC)::BIGINT tokens_covered
              FROM bands)
        SELECT CAST(pow(2, band - 1) AS BIGINT) threshold, vocab_size, tokens_covered,
          CAST(tokens_covered * 1000000 // t.nt AS BIGINT) coverage_ppm
        FROM c CROSS JOIN t ORDER BY threshold""")
    ),

    // ── Hash-split uniformity audit: q103's doc_id hash split drives
    //    train/test carving everywhere (q121's Bloom split, q139's
    //    versions) — this op proves the hash spreads evenly. 100 buckets,
    //    per-bucket counts, and the max absolute deviation from the
    //    uniform expectation in ppm: max_b |100·n_b − N|·10⁶ div (100·N).
    //    One aggregate + a 100-row reduction; a skewed hash shows up as
    //    dev_ppm far above the binomial noise floor.
    QueryDef(
      "q152_hash_uniformity",
      (s, d) => {
        val b = docs(s, d)
          .select(pmod(graft.functions.TextFunctions.hash32(
            concat(lit("q103|"), col("doc_id").cast(StringType))), lit(100)).as("bkt"))
          .groupBy(col("bkt")).agg(count(lit(1)).as("n"))
          .cache()
        b.crossJoin(broadcast(b.agg(sum(col("n")).as("nt"))))
          .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"),
            min(col("n")).as("min_bucket"), max(col("n")).as("max_bucket"),
            max(abs(col("n") * 100 - col("nt"))).as("maxdev"), max(col("nt")).as("nt2"))
          .select(col("n_buckets"), col("n_docs"), col("min_bucket"), col("max_bucket"),
            expr("(maxdev * 1000000) div (100 * nt2)").as("max_dev_ppm"))
      },
      Some("""WITH b AS (SELECT ('0x'||substr(md5('q103|'||doc_id::VARCHAR),1,8))::BIGINT % 100 bkt,
                 count(*)::BIGINT n
               FROM documents GROUP BY 1),
        t AS (SELECT sum(n)::BIGINT nt FROM b)
        SELECT count(*)::BIGINT n_buckets, sum(n)::BIGINT n_docs,
          min(n)::BIGINT min_bucket, max(n)::BIGINT max_bucket,
          CAST(max(abs(n*100 - t.nt)) * 1000000 // (100 * t.nt) AS BIGINT) max_dev_ppm
        FROM b CROSS JOIN t GROUP BY t.nt""")
    ),

    // ── Label-centroid distance matrix over QUANTIZED embeddings: the
    //    inter-class geometry report (which labels are confusable?).
    //    Determinism the q83 way: dims quantize to integers once
    //    (floor(v·2²⁰ + 0.5) — explicit half-up, identical in both
    //    engines), then every stage is exact integer arithmetic —
    //    per-(label, dim) sums via ONE posexplode + hash aggregate,
    //    centroid = sum div n, pairwise Σ (c1−c2)² by a dim equi-join.
    //    At 100 TB the per-dim aggregate is the only corpus-sized stage
    //    (map-side combine over label×dim cells); the matrix join runs
    //    on labels²·dims dimension rows.
    QueryDef(
      "q153_centroid_matrix",
      (s, d) => {
        val cents = emb(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("label"), col("dim"),
            expr("CAST(floor(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)").as("q"))
          .groupBy(col("label"), col("dim"))
          // centroid = floor(mean): shift by 2^21 per row so the numerator
          // is positive — Spark `div` truncates, DuckDB `//` floors, and
          // they only agree on non-negative operands (q146's rule)
          .agg(expr("((sum(q) + count(1) * 2097152) div count(1)) - 2097152").as("c"))
        cents.toDF("l1", "dim", "c1")
          .join(cents.toDF("l2", "dim2", "c2"),
            col("dim") === col("dim2") && col("l1") < col("l2"))
          .groupBy(col("l1"), col("l2"))
          .agg(sum((col("c1") - col("c2")) * (col("c1") - col("c2"))).as("dist_sq"))
      },
      Some("""WITH q AS (SELECT label, j dim,
                 CAST(floor(CAST(embedding[j+1] AS DOUBLE) * 1048576 + 0.5) AS BIGINT) q
               FROM embeddings, unnest(range(0, len(embedding))) t(j)),
        c AS (SELECT label, dim,
                CAST(((sum(q) + count(*) * 2097152) // count(*)) - 2097152 AS BIGINT) c
              FROM q GROUP BY 1, 2)
        SELECT a.label l1, b.label l2, sum((a.c - b.c) * (a.c - b.c))::BIGINT dist_sq
        FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2""")
    ),

    // ── HLL register MERGEABILITY — the property that makes sketches a
    //    distributed-systems tool at all: per-source register arrays
    //    (64 registers; rank = position of the lowest set bit of the
    //    hash suffix, an integer log2 via length(bin(x & -x)) — no float
    //    log) merged by element-wise MAX must equal the registers built
    //    directly over the union. Both sides computed, compared per
    //    register, pinned TRUE — plus an integer register checksum the
    //    hash check bites on. This is why a 1000-executor cardinality
    //    estimate needs no global distinct: registers combine
    //    associatively exactly like this query's merge aggregate.
    //    (The final cardinality estimate is a driver-side scalar formula
    //    over 64 small integers — deliberately out of scope; the
    //    distributed property IS the register algebra.)
    QueryDef(
      "q160_hll_merge",
      (s, d) => {
        val m = 64
        val terms = docs(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("term"))
          .where(length(col("term")) > 0)
          .withColumn("h", graft.functions.TextFunctions.hash32(col("term")))
          .select(col("source"),
            pmod(col("h"), lit(m)).as("reg"),
            expr(s"h div $m").as("rest"))
          .withColumn("rank",
            when(col("rest") === 0, lit(27L))
              .otherwise(expr("CAST(length(bin(rest & -rest)) AS BIGINT)")))
          .cache()
        val perSource = terms.groupBy(col("source"), col("reg"))
          .agg(max(col("rank")).as("r"))
        val merged = perSource.groupBy(col("reg")).agg(max(col("r")).as("r_merged"))
        val direct = terms.groupBy(col("reg")).agg(max(col("rank")).as("r_direct"))
        merged.join(direct, "reg")
          .agg(count(lit(1)).as("n_registers"),
            min(col("r_merged") === col("r_direct")).as("merge_equals_direct"),
            sum((col("reg") + 1) * col("r_direct")).as("register_checksum"))
      },
      Some(s"""WITH t AS (SELECT source, w term FROM
                 (SELECT source, unnest(string_split(text, ' ')) w FROM documents)
               WHERE len(w) > 0),
        h AS (SELECT source,
                ('0x'||substr(md5(term),1,8))::BIGINT % 64 reg,
                ('0x'||substr(md5(term),1,8))::BIGINT // 64 rest
              FROM t),
        r AS (SELECT source, reg,
                CASE WHEN rest = 0 THEN 27
                     ELSE len(bin(rest & -rest)) END::BIGINT rank
              FROM h),
        ps AS (SELECT source, reg, max(rank) r FROM r GROUP BY 1, 2),
        mg AS (SELECT reg, max(r) r_merged FROM ps GROUP BY 1),
        dr AS (SELECT reg, max(rank) r_direct FROM r GROUP BY 1)
        SELECT count(*)::BIGINT n_registers,
          min(mg.r_merged = dr.r_direct) AS merge_equals_direct,
          sum((mg.reg + 1) * dr.r_direct)::BIGINT AS register_checksum
        FROM mg JOIN dr USING (reg)""")
    )
  )
}
