package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftSparkExtensions
import graft.ops.SimilarityOps

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(-1.5f, 2.25f, -3.125f), Array(0.5f, -0.25f, 0.125f)),
    (4L, Array.empty[Float], Array.empty[Float])
  ).toDF("id", "a", "b")

  test("native dot and cosine match the fold formulation exactly") {
    val rows = vecs.select(
      SimilarityOps.dot(col("a"), col("b")).as("nd"),
      SimilarityOps.foldDot(col("a"), col("b")).as("fd"),
      SimilarityOps.cosine(col("a"), col("b")).as("nc"),
      SimilarityOps.foldCosine(col("a"), col("b")).as("fc")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact, not approx
      assert(r.getDouble(2) == r.getDouble(3))
    }
    // zero vector -> cosine 0.0, not NaN
    assert(vecs.where(col("id") === 2)
      .select(SimilarityOps.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("null propagation: null input, unequal lengths, null element") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f)))), // unequal
      (2L, Some(Seq(Some(1.0f), None)), Some(Seq(Some(3.0f), Some(4.0f)))), // null elem
      (3L, None, Some(Seq(Some(1.0f)))) // null array
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        SimilarityOps.dot(col("a"), col("b")).as("nd"),
        SimilarityOps.foldDot(col("a"), col("b")).as("fd"),
        SimilarityOps.cosine(col("a"), col("b")).as("nc"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2), r.isNullAt(3)))
    got.foreach { case (_, nd, fd, nc) =>
      assert(nd && nc)
      assert(nd == fd) // same nullability as the fold twin
    }
  }

  test("VectorArgmaxDot: composed-form contract — first max, -1 degenerates, codegen/eval parity") {
    import graft.functions.VectorExpressions
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 1.0, 0.0))
    def composed(a: org.apache.spark.sql.Column) = {
      val arr = array(cents.map(c => SimilarityOps.dot(a, lit(c.toArray))): _*)
      coalesce((array_position(arr, array_max(arr)) - 1).cast("int"), lit(-1))
    }
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(1.0f), Some(0.0f)))), // cell 0
      (2L, Some(Seq(Some(1.0f), Some(5.0f), Some(0.0f)))), // tied cells 1/2 → FIRST (1)
      (3L, Some(Seq(Some(0.0f), Some(0.0f), Some(0.0f)))), // all-zero → all dots 0 → first
      (4L, Some(Seq(Some(1.0f), None, Some(2.0f)))),       // null element → -1
      (5L, None),                                           // null vector → -1
      (6L, Some(Seq(Some(1.0f), Some(2.0f))))               // length mismatch → -1
    ).toDF("id", "v")
    val got = df.select(col("id"),
        VectorExpressions.argmaxDot(col("v"), cents).as("n"),
        composed(col("v")).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 0, 0), (2L, 1, 1), (3L, 0, 0),
      (4L, -1, -1), (5L, -1, -1), (6L, -1, -1)),
      s"native/composed drift: $got")
    // interpreted eval path agrees with codegen (nullable=false expr)
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def evalOf(v: Seq[Float]): Any = graft.functions.VectorArgmaxDot(
      CatLit.create(v, ArrayType(FloatType)), cents).eval(null)
    assert(evalOf(Seq(3.0f, 1.0f, 0.0f)) == 0)
    assert(evalOf(Seq(1.0f, 5.0f, 0.0f)) == 1)
    assert(evalOf(Seq(0.0f, 0.0f, 0.0f)) == 0)
    assert(evalOf(Seq(1.0f, 2.0f)) == -1)
    // empty centroid matrix → -1 everywhere
    assert(df.select(VectorExpressions.argmaxDot(col("v"), Nil))
      .collect().forall(_.getInt(0) == -1))
  }

  test("VectorSrpBucket: composed-form contract on the corpus + degenerates; codegen/eval parity") {
    import graft.functions.VectorExpressions
    // real corpus at a width past the literal form's comfort zone
    val emb = graft.sources.ImportSource.table(
      spark, "/root/testdata/sf0.001", "embeddings")
    Seq(2, 8, 15).foreach { planes =>
      val drift = emb.select(
          SimilarityOps.srpBucket(col("embedding"), planes, 64).as("n"),
          SimilarityOps.foldSrpBucket(col("embedding"), planes, 64).as("c"))
        .where(col("n") =!= col("c")).count()
      assert(drift == 0, s"native/composed drift at planes=$planes")
    }
    // degenerate rows: null vector / null element / length mismatch
    // land in bucket 0 under BOTH spellings (the when(null>=0)
    // otherwise-0 arm of the composed form)
    val degen = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f), Some(3.0f)))),
      (2L, Some(Seq(Some(1.0f), None, Some(2.0f)))),
      (3L, None),
      (4L, Some(Seq(Some(1.0f), Some(2.0f))))
    ).toDF("id", "v")
    val got = degen.select(col("id"),
        SimilarityOps.srpBucket(col("v"), 4, 3).as("n"),
        SimilarityOps.foldSrpBucket(col("v"), 4, 3).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, n, c) =>
      assert(n == c, s"degenerate drift at id=$id: native=$n composed=$c")
    }
    assert(got.filter(_._1 >= 2).forall(_._2 == 0L),
      "degenerate rows must land in bucket 0")
    // interpreted eval agrees with codegen; driver-side twin agrees too
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val planeM = (0 until 4).map(p => (0 until 3).map(
      d => SimilarityOps.srpWeight(p, d)))
    val v = Seq(1.0f, -2.0f, 0.5f)
    val evald = graft.functions.VectorSrpBucket(
      CatLit.create(v, ArrayType(FloatType)), planeM).eval(null)
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(SimilarityOps.srpBucket(col("v"), 4, 3)).head().getLong(0)
    assert(evald == viaDf)
    assert(SimilarityOps.srpBucketOf(v, 4) == viaDf,
      "driver-side srpBucketOf must agree with the native expression")
  }

  test("double arrays and mixed float/double sides work") {
    val df = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(SimilarityOps.dot(col("a"), col("b"))).head().getDouble(0) == 11.0)
  }

  test("vector_dot / vector_cosine are SQL-callable after registration") {
    GraftSparkExtensions.register(spark)
    vecs.createOrReplaceTempView("vex")
    val r = spark.sql(
      """SELECT vector_dot(a, b) AS d, vector_cosine(a, b) AS c
        |FROM vex WHERE id = 1""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("composite library ops are SQL-callable: hash_unit, zvalue, jaccard, simhash") {
    GraftSparkExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_hash_unit(42) AS h,
        |  graft_zvalue(3, 5) AS z,
        |  graft_jaccard('a b c', 'b c d') AS j,
        |  graft_simhash('hello world') AS s""".stripMargin).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) < 1.0)
    assert(graft.ops.LayoutOps.unZValue(r.getLong(1), 16) == ((3L, 5L)))
    assert(r.getDouble(2) == 0.5) // |{b,c}| / |{a,b,c,d}|
    // same value as the Column API
    val viaApi = Seq("hello world").toDF("t")
      .select(graft.ops.DedupOps.simhash(col("t"))).head().getLong(0)
    assert(r.getLong(3) == viaApi)
    // the Gopher gate verdict is SQL-callable with the same semantics
    // as the DataFrame op (55 words, stopwords present -> keep)
    val good = ("the cat sat on mat with dog and bird that flew " * 5).trim
    val g = spark.sql(
      s"SELECT graft_gopher_keep('$good') AS k1, graft_gopher_keep('x') AS k2")
      .head()
    assert(g.getInt(0) == 1 && g.getInt(1) == 0)
  }

  test("VectorFoldRewrite replaces the fold dot with the native expression") {
    GraftSparkExtensions.register(spark)
    // parquet-backed input so nothing constant-folds away pre-rule
    val emb = graft.sources.ImportSource.table(spark,
      "/root/testdata/sf0.001", "embeddings")
    val folded = emb.select(
      SimilarityOps.foldDot(col("embedding"), col("embedding")).as("d"))
    val opt = folded.queryExecution.optimizedPlan.toString
    assert(opt.contains("vector_dot"), s"fold not rewritten:\n$opt")
    assert(!opt.contains("aggregate(zip_with"), s"fold survived:\n$opt")
    // rewritten plan computes the same values as the unoptimized fold
    val viaRule = folded.collect().map(_.getDouble(0))
    val native = emb.select(
      SimilarityOps.dot(col("embedding"), col("embedding"))).collect().map(_.getDouble(0))
    assert(viaRule.toSeq == native.toSeq)
  }

  test("VectorFoldRewrite leaves non-dot folds alone") {
    GraftSparkExtensions.register(spark)
    val emb = graft.sources.ImportSource.table(spark,
      "/root/testdata/sf0.001", "embeddings")
    // sum-of-abs: same aggregate/zip_with scaffolding, different body
    val other = emb.select(aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => abs(x.cast("double")) + abs(y.cast("double"))),
      lit(0.0), (acc, v) => acc + v).as("s"))
    val opt = other.queryExecution.optimizedPlan.toString
    assert(!opt.contains("vector_dot"), s"over-eager rewrite:\n$opt")
  }

  test("min_shingle_md5 is SQL-callable and matches the Scala API") {
    GraftSparkExtensions.register(spark)
    val docs = graft.sources.ImportSource.table(spark,
      "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("vdocs")
    val viaSql = spark.sql(
      "SELECT doc_id, min_shingle_md5(text, 3) AS fp FROM vdocs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val viaApi = docs.select(col("doc_id"),
        graft.ops.TextOps.minShingleFingerprint(col("text"), 3).as("fp"))
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSql.toSeq == viaApi.toSeq && viaSql.nonEmpty)
  }

  test("MinShingleMd5 equals the array_min(transform(shingles, md5)) fold exactly") {
    import graft.ops.TextOps
    val docs = graft.sources.ImportSource.table(spark,
      "/root/testdata/sf0.001", "documents")
    for (n <- Seq(1, 3, 7)) {
      val both = docs.select(
        graft.functions.MinShingleMd5.of(TextOps.tokens(col("text")), n).as("native"),
        array_min(transform(TextOps.shinglesOfTokens(TextOps.tokens(col("text")), n),
          s => md5(s))).as("fold"))
      assert(both.where(col("native") =!= col("fold")).count() == 0, s"n=$n mismatch")
      assert(both.where(col("native").isNull).count() == 0)
    }
    // short-text edge: fewer tokens than n -> single whole-array shingle
    val tiny = Seq("one two", "", "solo").toDF("text")
    val t = tiny.select(
      graft.functions.MinShingleMd5.of(TextOps.tokens(col("text")), 5).as("native"),
      array_min(transform(TextOps.shinglesOfTokens(TextOps.tokens(col("text")), 5),
        s => md5(s))).as("fold"))
    assert(t.where(col("native") =!= col("fold")).count() == 0)
  }

  test("expressions stay inside whole-stage codegen") {
    // a parquet scan can't constant-fold away, so the projection must
    // actually compile (a CodegenFallback expression would split the
    // WholeStageCodegen span)
    val emb = graft.sources.ImportSource.table(spark,
      "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(
      SimilarityOps.cosine(col("embedding"), col("embedding")).as("c"))
    val hasCodegenSpan = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegenSpan)
    assert(df.where(col("c") > 0.99).count() > 0) // executes through codegen
  }

  test("graft_bpeish_count SQL spelling matches the Scala op") {
    GraftSparkExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_bpeish_count(\"it's 2024, #tag-42!\") AS n")
      .collect().head.getLong(0)
    assert(viaSql == 9L) // it|'s| 2024|,| #|tag|-|42|!
  }

  test("nfc_normalize composes combining marks; NFC input passes through; SQL-callable") {
    GraftSparkExtensions.register(spark)
    val decomposed = "café ô x" // e + U+0301, o + U+0302
    val composed = "café ô x"
    val df = Seq((1L, decomposed), (2L, composed), (3L, "ascii only"),
        (4L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .select(col("id"), graft.functions.NfcNormalize(col("s")).as("n"),
        length(col("s")).as("lr"),
        length(graft.functions.NfcNormalize(col("s"))).as("ln"))
    val rows = df.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)), if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))).toMap
    assert(rows(1L)._1.contains(composed), "marks must compose")
    assert(rows(1L)._2 == rows(1L)._3 + 2, "two combining marks absorbed")
    assert(rows(2L)._1.contains(composed) && rows(2L)._2 == rows(2L)._3)
    assert(rows(3L)._1.contains("ascii only"))
    assert(rows(4L)._1.isEmpty, "null propagates")
    // registered SQL spelling, through codegen (parquet-free project
    // still exercises eval; the codegen span is asserted on a scan)
    val viaSql = spark.sql(
      s"SELECT nfc_normalize('café') AS n").collect().head.getString(0)
    assert(viaSql == "café")
    // stays inside whole-stage codegen over a real scan
    val docs = graft.sources.ImportSource.table(spark,
      "/root/testdata/sf0.001", "documents")
    val plan = docs.select(graft.functions.NfcNormalize(col("text")).as("n"))
      .queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
  }
  test("VectorOuterSum: matches the exploded-struct formulation; nulls, merge, mixed dims") {
    import graft.functions.VectorOuterSum
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // composed reference (the pre-r8 q158 shape, same quantization)
    def composed(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(flatten(
          transform(sequence(lit(0), size(col("v")) - 1), i =>
            transform(sequence(i, size(col("v")) - 1), j =>
              struct(i.as("i"), j.as("j"),
                (element_at(col("v"), i + 1).cast(DoubleType) *
                  element_at(col("v"), j + 1).cast(DoubleType)).as("xy"))))))
          .as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        round(col("p.xy") * 1e12).cast(LongType).as("xy"))
      .groupBy(col("i"), col("j"))
      .agg(graft.functions.Int128Sum.exactLongSum(col("xy")).as("sxy"),
        count(lit(1)).as("n"))
    def native(df: org.apache.spark.sql.DataFrame) = df
      .groupBy().agg(VectorOuterSum.outerSum(col("v")).as("c"))
      .select(explode(col("c")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.sxy").as("sxy"), col("p.n").as("n"))
    // negative components + values engineered near rounding ties
    val df = Seq(
      Array(1.0f, -2.0f, 0.5f),
      Array(-1.5f, 0.25f, -3.0f),
      Array(0.000244140625f, -0.000244140625f, 2.0f), // 2^-12: exact .5 picounit ties
      Array(0.1f, 0.2f, 0.3f)
    ).toDF("v").repartition(3) // forces partial buffers + merge
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getInt(1)) -> (r.getDecimal(2).toString, r.getLong(3))
    val c = composed(df).collect().map(key).toMap
    val n = native(df).collect().map(key).toMap
    assert(n == c, s"native vs composed drift:\nnative=$n\ncomposed=$c")
    // null ELEMENT skips its products, row still counts (composed parity)
    val dfn = Seq(
      (1L, Some(Seq(Some(1.0f), None))),
      (2L, Some(Seq(Some(2.0f), Some(3.0f)))),
      (3L, None) // null vector contributes nothing
    ).toDF("id", "v").where(col("v").isNotNull)
    val cn = composed(dfn).collect().map(key).toMap
    val nn = native(dfn).collect().map(key).toMap
    assert(nn == cn)
    assert(nn((0, 1))._2 == 2L, "null-element row still counts")
    // empty input: one global-agg row, zero exploded cells
    val empty = Seq.empty[Array[Float]].toDF("v")
    assert(native(empty).count() == 0)
    // mixed dimensions fail loudly, not by silent key-space mixing
    val mixed = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)).toDF("v")
    val err = intercept[org.apache.spark.SparkException] {
      native(mixed.coalesce(1)).collect()
    }
    assert(err.getMessage.contains("mixed dimensions")
      || Option(err.getCause).exists(_.getMessage.contains("mixed dimensions")))
    // registered SQL spelling
    GraftSparkExtensions.register(spark)
    df.createOrReplaceTempView("vos_in")
    val viaSql = spark.sql(
      "SELECT explode(vector_outer_sum(v)) AS p FROM vos_in")
      .select(col("p.i"), col("p.j"), col("p.sxy"), col("p.n"))
      .collect().map(key).toMap
    assert(viaSql == c)
  }

  test("VectorOuterSum.quantize: matches Spark round() at half boundaries") {
    import graft.functions.VectorOuterSum
    // Spark's Round on double: BigDecimal(shortest repr), HALF_UP.
    def sparkRound(x: Double): Long =
      if (x != x) 0L
      else if (x.isInfinite) (if (x > 0) Long.MaxValue else Long.MinValue)
      else BigDecimal(x) // shortest-repr decimal, like Double.toString
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val q = VectorOuterSum(
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(Array(0.0f))))
    // the value the floor(x+0.5) form got wrong: 1 ulp below an exact
    // half, where the +0.5 addition ties-to-even ACROSS the boundary
    val justBelowHalf = math.nextAfter(0.5, 0.0)
    val cases = Seq(
      justBelowHalf, -justBelowHalf,
      0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
      math.nextAfter(1.5, 0.0), math.nextAfter(-1.5, 0.0),
      math.nextAfter(2.5, 3.0), 0.49999999999, -0.49999999999,
      0.0, -0.0, 1e15 + 0.5, -(1e15 + 0.5), Double.NaN)
    cases.foreach { x =>
      assert(q.quantize(x) == sparkRound(x),
        s"quantize($x)=${q.quantize(x)} but Spark round gives ${sparkRound(x)}")
    }
    // and the specific regression: floor(x+0.5) would say 1 here
    assert(q.quantize(justBelowHalf) == 0L)
  }

  test("VectorArgmaxDotCells: per-row matrix twin of VectorArgmaxDot") {
    import graft.functions.VectorExpressions
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 1.0, 0.0))
    // foldable matrix (ConstantFolding drives the interpreted eval
    // path): bit-identical verdicts to the literal-matrix expression
    // across win/tie/zero/null-element/null-vec/length-mismatch
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(1.0f), Some(0.0f)))), // cell 0
      (2L, Some(Seq(Some(1.0f), Some(5.0f), Some(0.0f)))), // tie 1/2 -> FIRST
      (3L, Some(Seq(Some(0.0f), Some(0.0f), Some(0.0f)))), // all dots 0 -> first
      (4L, Some(Seq(Some(1.0f), None, Some(2.0f)))),       // null element -> -1
      (5L, None),                                          // null vector -> -1
      (6L, Some(Seq(Some(1.0f), Some(2.0f))))              // length mismatch -> -1
    ).toDF("id", "v")
    val got = df.select(col("id"),
        VectorExpressions.argmaxDotCells(col("v"), typedLit(cents)).as("c"),
        VectorExpressions.argmaxDot(col("v"), cents).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    got.foreach { case (id, c, n) => assert(c == n, s"id=$id col=$c lit=$n") }
    // null matrix -> -1 (expression is non-nullable by contract)
    assert(df.select(VectorExpressions.argmaxDotCells(col("v"),
        lit(null).cast("array<array<double>>")))
      .collect().forall(_.getInt(0) == -1))

    // non-foldable per-row matrices (whole-stage codegen path):
    // null rows, rows with null elements and length mismatches are
    // SKIPPED like array_max skips null dots; empty list -> -1
    val rows = Seq(
      (Seq(1.0f, 0.0f),
        Seq(Some(Seq(Some(0.0), Some(1.0))), Some(Seq(Some(1.0), Some(0.0)))), 1),
      (Seq(1.0f, 0.0f),
        Seq(None, Some(Seq(Some(1.0), Some(0.0)))), 1),                 // null row
      (Seq(1.0f, 0.0f),
        Seq(Some(Seq(Some(1.0))), Some(Seq(Some(0.5), Some(0.0)))), 1), // mismatch
      (Seq(1.0f, 0.0f),
        Seq(Some(Seq(Some(1.0), None)), Some(Seq(Some(0.5), Some(0.0)))), 1), // null elem
      (Seq(1.0f, 0.0f), Seq.empty[Option[Seq[Option[Double]]]], -1)
    ).toDF("v", "m", "want")
    rows.select(VectorExpressions.argmaxDotCells(col("v"), col("m")).as("got"),
        col("want"))
      .collect().foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"got ${r.getInt(0)} want ${r.getInt(1)}"))

    // SQL spelling after registration
    GraftSparkExtensions.register(spark)
    assert(spark.sql(
      "SELECT vector_argmax_dot_cells(array(cast(0.0 as float), cast(2.0 as float)), " +
        "array(array(1.0d, 0.0d), array(0.0d, 1.0d))) AS c").head().getInt(0) == 1)
  }

  test("VectorTopDotCells: top-n (dot DESC, index ASC); element 0 equals argmax") {
    import graft.functions.VectorExpressions
    // foldable matrix: ranking, ties, and the argmax-consistency
    // contract (element 0 == argmaxDotCells whenever non-empty)
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.0, 1.0, 0.0), Seq(0.5, 0.5, 0.0))
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(1.0f), Some(0.0f)))),
      (2L, Some(Seq(Some(1.0f), Some(5.0f), Some(0.0f)))), // tie 1/2 -> 1 then 2
      (3L, Some(Seq(Some(0.0f), Some(0.0f), Some(0.0f)))), // all-zero: index order
      (4L, Some(Seq(Some(1.0f), None, Some(2.0f)))),       // null element -> empty
      (5L, None),                                          // null vector -> empty
      (6L, Some(Seq(Some(1.0f), Some(2.0f))))              // length mismatch -> empty
    ).toDF("id", "v")
    val got = df.select(col("id"),
        VectorExpressions.topDotCells(col("v"), typedLit(cents), 3).as("t"),
        VectorExpressions.argmaxDotCells(col("v"), typedLit(cents)).as("a"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toList, r.getInt(2))))
      .toMap
    // id 1: dots (3, 1, 1, 2) -> 0, 3, then tie (1,2) -> 1
    assert(got(1L)._1 == List(0, 3, 1))
    // id 2: dots (1, 5, 5, 3) -> tie at 5 ranks lower index first
    assert(got(2L)._1 == List(1, 2, 3))
    // id 3: all dots equal -> pure index order
    assert(got(3L)._1 == List(0, 1, 2))
    // degenerates: empty, and argmax says -1
    Seq(4L, 5L, 6L).foreach { id =>
      assert(got(id)._1.isEmpty && got(id)._2 == -1, s"id=$id")
    }
    // element 0 == argmax whenever non-empty
    got.values.foreach { case (t, a) =>
      if (t.nonEmpty) assert(t.head == a)
    }
    // n larger than the matrix returns all valid indices
    assert(df.where(col("id") === 1L)
      .select(VectorExpressions.topDotCells(col("v"), typedLit(cents), 10))
      .head().getSeq[Int](0).size == 4)
    // PREFIX property: top-m is exactly the first m of top-n for every
    // m <= n (ties ranked by index are total, so the ranking is one
    // fixed permutation) — q194 derives the nprobe 1/2 probe sets by
    // slicing ONE nprobe=4 assignment on exactly this contract
    (1 to 4).foreach { m =>
      val wide = df.select(col("id"),
        VectorExpressions.topDotCells(col("v"), typedLit(cents), 4).as("w"),
        VectorExpressions.topDotCells(col("v"), typedLit(cents), m).as("n"))
        .collect()
      wide.foreach { r =>
        assert(r.getSeq[Int](1).take(m) == r.getSeq[Int](2),
          s"id=${r.getLong(0)} m=$m: top-4 prefix != top-$m")
      }
    }
    // n=1 IS argmax for every non-degenerate row
    df.select(VectorExpressions.topDotCells(col("v"), typedLit(cents), 1).as("t"),
        VectorExpressions.argmaxDotCells(col("v"), typedLit(cents)).as("a"))
      .collect().foreach { r =>
        val t = r.getSeq[Int](0)
        assert(if (r.getInt(1) == -1) t.isEmpty else t == Seq(r.getInt(1)))
      }

    // non-foldable per-row matrices (codegen path): null rows /
    // mismatches skipped, empty list -> empty result
    val rows = Seq(
      (Seq(1.0f, 0.0f),
        Seq(Some(Seq(Some(0.0), Some(1.0))), Some(Seq(Some(1.0), Some(0.0)))),
        Seq(1, 0)),
      (Seq(1.0f, 0.0f),
        Seq(None, Some(Seq(Some(1.0), Some(0.0)))), Seq(1)),
      (Seq(1.0f, 0.0f),
        Seq(Some(Seq(Some(1.0))), Some(Seq(Some(0.5), Some(0.0)))), Seq(1)),
      (Seq(1.0f, 0.0f), Seq.empty[Option[Seq[Option[Double]]]], Seq.empty[Int])
    ).toDF("v", "m", "want")
    rows.select(VectorExpressions.topDotCells(col("v"), col("m"), 2).as("got"),
        col("want"))
      .collect().foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"got ${r.getSeq[Int](0)} want ${r.getSeq[Int](1)}"))

    // SQL spelling after registration
    GraftSparkExtensions.register(spark)
    assert(spark.sql(
      "SELECT vector_top_dot_cells(array(cast(0.0 as float), cast(2.0 as float)), " +
        "array(array(1.0d, 0.0d), array(0.0d, 1.0d), array(0.0d, 0.5d)), 2) AS t")
      .head().getSeq[Int](0) == Seq(1, 2))
  }

  test("VectorTopDot: literal-matrix top-n; element 0 equals VectorArgmaxDot; prefix property") {
    import graft.functions.VectorExpressions
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.0, 1.0, 0.0), Seq(0.5, 0.5, 0.0))
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(1.0f), Some(0.0f)))),
      (2L, Some(Seq(Some(1.0f), Some(5.0f), Some(0.0f)))), // tie 1/2
      (3L, Some(Seq(Some(1.0f), None, Some(2.0f)))),       // null elem -> empty
      (4L, None),                                          // null vec -> empty
      (5L, Some(Seq(Some(1.0f), Some(2.0f))))              // mismatch -> empty
    ).toDF("id", "v")
    val got = df.select(col("id"),
        VectorExpressions.topDot(col("v"), cents, 3).as("t"),
        VectorExpressions.argmaxDot(col("v"), cents).as("a"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toList, r.getInt(2))))
      .toMap
    assert(got(1L)._1 == List(0, 3, 1))
    assert(got(2L)._1 == List(1, 2, 3)) // equal scores rank lower index first
    Seq(3L, 4L, 5L).foreach { id =>
      assert(got(id)._1.isEmpty && got(id)._2 == -1, s"id=$id")
    }
    got.values.foreach { case (t, a) => if (t.nonEmpty) assert(t.head == a) }
    // prefix property, the same contract the fine-level top-n carries
    (1 to 4).foreach { m =>
      df.select(VectorExpressions.topDot(col("v"), cents, 4).as("w"),
          VectorExpressions.topDot(col("v"), cents, m).as("n"))
        .collect().foreach { r =>
          assert(r.getSeq[Int](0).take(m) == r.getSeq[Int](1))
        }
    }
  }

  test("VectorMatmul: identical to array(k VectorDots); degenerates are all-null arrays") {
    import graft.functions.VectorExpressions
    val matrix = Seq(Seq(1.0, 0.0, 2.0), Seq(-1.0, 0.5, 0.0))
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(1.0f), Some(0.5f)))), // clean
      (2L, Some(Seq(Some(1.0f), None, Some(2.0f)))),       // null element
      (3L, None),                                          // null vector
      (4L, Some(Seq(Some(1.0f), Some(2.0f))))              // length mismatch
    ).toDF("id", "v")
    val composed = array(matrix.map(r =>
      VectorExpressions.dot(col("v"), typedLit(r))): _*)
    val rows = df.select(col("id"),
        VectorExpressions.matmul(col("v"), matrix).as("m"),
        composed.as("c"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1), "matmul result array is never null")
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"id=${r.getLong(0)}: ${r.getSeq[Any](1)} vs ${r.getSeq[Any](2)}")
    }
    // empty matrix -> empty array (posexplode emits nothing)
    assert(df.select(VectorExpressions.matmul(col("v"), Nil))
      .collect().forall(_.getSeq[Any](0).isEmpty))
  }
}
