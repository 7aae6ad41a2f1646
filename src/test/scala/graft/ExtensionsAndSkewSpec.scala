package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** SQL-surface (extensions) and skew-mitigation specs. */
class ExtensionsAndSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("vec_dot SQL function matches hand-computed dot product") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .head().getDouble(0)
    assert(got === 32.0)
  }

  test("whole custom-expression surface is callable from pure SQL") {
    GraftExtensions.register(spark)
    // canon_alnum ≡ the regex pipeline it replaces
    val canon = spark.sql("SELECT canon_alnum('  Héllo,  WORLD 42!  ')").head().getString(0)
    assert(canon === "hllo world 42")
    // shingle_hash32 / chargram_hash32 / token_hash32 / simhash_word return
    // the same values as the Column API wrappers
    val viaSql = spark.sql(
      """SELECT shingle_hash32(array('a','b','c','d'), 3, 2147483647) sh,
                chargram_hash32('abcd', 3) cg,
                token_hash32(array('ab','cd'), 0) th,
                simhash_word(token_hash32(array('ab','cd'), 0)) sw""").head()
    val toks = array(lit("ab"), lit("cd"))
    val viaCol = spark.range(1).select(
      graft.functions.HashExpressions.shingleHash32(
        array(lit("a"), lit("b"), lit("c"), lit("d")), 3).as("sh"),
      graft.functions.HashExpressions.charGramHash32(lit("abcd"), 3).as("cg"),
      graft.functions.HashExpressions.tokenHash32(toks).as("th"),
      graft.functions.HashExpressions.simhashWord(
        graft.functions.HashExpressions.tokenHash32(toks)).as("sw")).head()
    assert(viaSql.getSeq[Long](0) === viaCol.getSeq[Long](0))
    assert(viaSql.getSeq[Long](1) === viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) === viaCol.getSeq[Long](2))
    assert(viaSql.getLong(3) === viaCol.getLong(3))
    // image_dims parses a real JDK-encoded PNG through SQL
    val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val dims = Seq(Tuple1(bos.toByteArray)).toDF("b").createOrReplaceTempView("imgs")
    val r = spark.sql("SELECT image_dims(b).format f, image_dims(b).width w, image_dims(b).height h FROM imgs").head()
    assert(r.getString(0) === "png" && r.getInt(1) === 7 && r.getInt(2) === 5)
  }

  test("range-join strategy registers through the extensions path too") {
    GraftExtensions.register(spark)
    val strategies = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraStrategies
    assert(strategies.contains(graft.plans.RangeJoinStrategy))
    assert(strategies.contains(graft.plans.AsofJoinStrategy))
  }

  test("explode_signals UDTF: LATERAL VIEW over raw payload JSON") {
    GraftExtensions.register(spark)
    Seq(
      ("""{"speed": 55.5, "make": "toyota", "engineLoad": 0.5}""", "v1"),
      ("""not json""", "v2"),
      ("""{"unknownField": 1}""", "v3")
    ).toDF("data", "subject").createOrReplaceTempView("status_raw")
    val rows = spark.sql(
      """SELECT subject, s.name, s.value_number, s.value_string
        |FROM status_raw
        |LATERAL VIEW explode_signals(data) s AS name, value_number, value_string""".stripMargin
    ).collect()
    assert(rows.length === 3) // only v1's three known signals
    val byName = rows.map(r => r.getString(1) -> r).toMap
    assert(byName("Vehicle.Speed").getDouble(2) === 55.5)
    assert(byName("Vehicle.VehicleIdentification.Brand").getString(3) === "toyota")
    assert(byName("Vehicle.OBD.EngineLoad").getDouble(2) === 50.0) // ratio→percent
  }

  test("UDTF agrees with the Column-program explosion on the fixture corpus") {
    GraftExtensions.register(spark)
    val docs = graft.sources.StatusSource.readJson(
      spark, getClass.getResource("/static_vehicle_data_test.json").getPath)
    docs.select(col("subject"), to_json(col("data")).as("data")).createOrReplaceTempView("fixture_raw")
    val udtf = spark.sql(
      "SELECT subject, s.name FROM fixture_raw LATERAL VIEW explode_signals(data) s AS name, value_number, value_string")
    assert(udtf.count() === 8L * 18)
  }

  test("name filter is pushed into the explode_signals generator") {
    GraftExtensions.register(spark)
    val docs = graft.sources.StatusSource.readJson(
      spark, getClass.getResource("/static_vehicle_data_test.json").getPath)
    docs.select(col("subject"), to_json(col("data")).as("data")).createOrReplaceTempView("fixture_raw2")
    val q = spark.sql(
      """SELECT subject, s.name, s.value_number
        |FROM fixture_raw2
        |LATERAL VIEW explode_signals(data) s AS name, value_number, value_string
        |WHERE s.name = 'Vehicle.Speed'""".stripMargin)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Some(List(Vehicle.Speed))"),
      "generator should carry the pushed name set\n" + optimized)
    assert(q.count() === 8) // same rows as the unpushed filter
    // IN-list form pushes too.
    val q2 = spark.sql(
      """SELECT s.name FROM fixture_raw2
        |LATERAL VIEW explode_signals(data) s AS name, value_number, value_string
        |WHERE s.name IN ('Vehicle.Speed', 'Vehicle.VehicleIdentification.Brand')""".stripMargin)
    assert(q2.queryExecution.optimizedPlan.toString.contains("Vehicle.VehicleIdentification.Brand"), q2.queryExecution.optimizedPlan.toString)
    assert(q2.count() === 16)
  }

  test("salted join equals plain join") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = fact.join(dim, "o_custkey").count()
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", buckets = 4).count()
    assert(salted === plain)
  }

  test("null-safe skew-guarded join equals the plain <=> join; null slice broadcasts") {
    import spark.implicits._
    // Mixed keys with a hot null: 100 null-keyed rows, a few real keys.
    val left = (1 to 100).map(i => (i.toLong, Option.empty[String])) ++
      Seq((101L, Some("a")), (102L, Some("a")), (103L, Some("b")))
    val l = left.toDF("id", "k")
    val grp = l.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val plain = l.join(grp, l("k") <=> grp("k"))
      .select(col("id"), col("n")).collect().sortBy(_.getLong(0)).toSeq
    val guarded = Skew.nullSafeJoinSkewGuarded(l, grp, "k")
      .select(col("id"), col("n")).collect().sortBy(_.getLong(0)).toSeq
    assert(guarded === plain)
    // The null slice goes through a broadcast, not a shuffled hash join.
    val p = Skew.nullSafeJoinSkewGuarded(l, grp, "k").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }
}
