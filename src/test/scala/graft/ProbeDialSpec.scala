package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SimilarityOps

/** The probe-dial unification contract (VERDICT r12 ask #8): the
  * single-level ANN surface ([[SimilarityOps.ivfProbe]], the store's
  * nprobe dial) and the two-level family
  * ([[SimilarityOps.twoLevelProbe]]/[[SimilarityOps.twoLevelProbeWide]])
  * expose ONE dial language on ONE output shape, so a consumer can
  * switch surfaces without re-learning the contract:
  *
  *  1. output shape (id, vec, cell, probe_cells) with
  *     probe_cells[0] = cell on every surface;
  *  2. nprobe = 1 degenerates to the surface's plain assignment;
  *  3. degenerate rows (null vec, null element, mismatched dims)
  *     carry the same sentinel (cell = −1, probe_cells = [−1]) —
  *     never dropped, never junk-blocked;
  *  4. the dial parameter NAMES agree across surfaces (reflection —
  *     a rename on one surface alone is drift);
  *  5. the recall evaluator composes identically: cellRecallProbe ∘
  *     ivfProbe reproduces annRecall's numbers on the same dial.
  */
class ProbeDialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  def embeddings = graft.sources.ImportSource.table(spark, sf, "embeddings")

  private def paramNames(method: String): Seq[String] = {
    val ms = SimilarityOps.getClass.getMethods.filter(_.getName == method)
    assert(ms.nonEmpty, s"no method $method")
    ms.head.getParameters.map(_.getName).toSeq
  }

  test("dial names agree across the three probe surfaces") {
    assert(paramNames("ivfProbe").contains("nprobe"))
    assert(paramNames("twoLevelProbe").contains("nprobe"))
    assert(paramNames("twoLevelProbeWide").contains("nprobe"))
    assert(paramNames("twoLevelProbeWide").contains("nprobeCoarse"))
    // the common output shape is pinned by the schema checks below
  }

  test("common output shape; probe_cells[0]=cell; nprobe=1 degenerates; shared sentinel") {
    val dim = embeddings.select($"embedding").as[Seq[Float]].head.size
    val degen = Seq(
      (-1L, null.asInstanceOf[Seq[Float]]),
      (-2L, Seq.fill(dim + 1)(1.0f))
    ).toDF("vec_id", "embedding")
    val aug = embeddings.select($"vec_id", $"embedding").unionByName(degen)
    val cents = SimilarityOps.sqrtSeedCentroids(aug, "vec_id", "embedding")

    val surfaces: Seq[(String, Int => org.apache.spark.sql.DataFrame)] = Seq(
      "ivfProbe" -> ((np: Int) =>
        SimilarityOps.ivfProbe(aug, "vec_id", "embedding", cents, np)),
      "twoLevelProbe" -> ((np: Int) =>
        SimilarityOps.twoLevelProbe(aug, "vec_id", "embedding", nprobe = np)),
      "twoLevelProbeWide" -> ((np: Int) =>
        SimilarityOps.twoLevelProbeWide(aug, "vec_id", "embedding",
          nprobeCoarse = 2, nprobe = np)))

    surfaces.foreach { case (name, mk) =>
      val df = mk(3)
      assert(df.columns.toSeq == Seq("id", "vec", "cell", "probe_cells"),
        s"$name output shape drifted: ${df.columns.toSeq}")
      val rows = df.select($"id", $"cell", $"probe_cells")
        .as[(Long, Long, Seq[Long])].collect()
      assert(rows.length == aug.count(), s"$name dropped rows")
      rows.foreach { case (id, cell, pcs) =>
        assert(pcs.head == cell, s"$name id=$id probe_cells[0] != cell")
        assert(pcs.distinct.size == pcs.size, s"$name id=$id dup probes")
      }
      // shared sentinel on BOTH degenerate shapes
      Seq(-1L, -2L).foreach { id =>
        val r = rows.find(_._1 == id).get
        assert(r._2 == -1L && r._3 == Seq(-1L),
          s"$name degenerate id=$id: $r (want sentinel)")
      }
      // nprobe=1 IS the plain assignment: probe set collapses to the cell
      mk(1).select($"cell", $"probe_cells").as[(Long, Seq[Long])]
        .collect().foreach { case (cell, pcs) =>
          assert(pcs == Seq(cell), s"$name nprobe=1 probe=$pcs cell=$cell")
        }
    }
    // ivfProbe's nprobe=1 cell IS ivfAssign (the store's argmax rule)
    val viaProbe = SimilarityOps.ivfProbe(aug, "vec_id", "embedding", cents, 1)
      .select($"id", $"cell").as[(Long, Long)].collect().toMap
    val viaAssign = aug.select(col("vec_id").as("id"),
        SimilarityOps.ivfAssign(col("embedding"), cents).cast("long").as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(viaProbe == viaAssign, "ivfProbe(np=1) != ivfAssign")
  }

  test("semDedupProbed consumes every probe surface: wrapper equivalence + single-level degeneracy") {
    val emb = embeddings
    import org.apache.spark.sql.DataFrame
    def kept(df: DataFrame): Map[Long, Boolean] =
      df.select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    // the two-level wrapper IS semDedupProbed over twoLevelProbe
    val viaWrapper = kept(SimilarityOps.semDedupTwoLevelProbe(
      emb, "vec_id", "embedding", threshold = 0.3, nprobe = 2))
    val viaCommon = kept(SimilarityOps.semDedupProbed(
      SimilarityOps.twoLevelProbe(emb, "vec_id", "embedding", nprobe = 2),
      threshold = 0.3))
    assert(viaWrapper == viaCommon)
    // fed the WIDE surface at nprobeCoarse=1 it matches the fine form
    val viaWide1 = kept(SimilarityOps.semDedupProbed(
      SimilarityOps.twoLevelProbeWide(emb, "vec_id", "embedding",
        nprobeCoarse = 1, nprobe = 2), threshold = 0.3))
    assert(viaWide1 == viaCommon)
    // fed the SINGLE-level surface at nprobe=1 it is semDedup on the
    // same centroids (probe set collapses to the own cell)
    val cents = SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding")
    val viaIvf1 = kept(SimilarityOps.semDedupProbed(
      SimilarityOps.ivfProbe(emb, "vec_id", "embedding", cents, 1),
      threshold = 0.3))
    val viaPlain = kept(SimilarityOps.semDedup(
      emb, "vec_id", "embedding", cents, threshold = 0.3))
    assert(viaIvf1 == viaPlain,
      "semDedupProbed(ivfProbe, np=1) != semDedup on the same centroids")
  }

  test("cellRecallProbe ∘ ivfProbe reproduces annRecall on the same dial") {
    val emb = embeddings
    val cents = SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding")
    val pred = col("id") % 10 === 0
    val assigned = SimilarityOps.ivfProbe(emb, "vec_id", "embedding", cents, 2)
    val viaCommon = SimilarityOps.cellRecallProbe(assigned, "id", "vec",
        "cell", "probe_cells", pred, k = 5)
      .select($"qid", $"recall").as[(Long, Double)].collect().sortBy(_._1)
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val viaAnn = SimilarityOps.annRecall(emb, "vec_id", "embedding",
        queries, "qid", "embedding", cents, k = 5, nprobe = 2)
      .select($"qid", $"recall").as[(Long, Double)].collect().sortBy(_._1)
    assert(viaCommon.toSeq == viaAnn.toSeq,
      s"evaluator split-brain: common=${viaCommon.take(5).toSeq} " +
        s"ann=${viaAnn.take(5).toSeq}")
  }

  test("store default dial serves the declared operating point (ivfProbe spelling)") {
    val emb = embeddings
    val cents = SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding")
    val np = SimilarityOps.retrievalNprobe(cents.size)
    assert(np == math.max(1, math.ceil(0.55 * cents.size).toInt),
      "retrievalNprobe must be the declared ⌈0.55·k⌉ dial (q197)")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_dial").toString + "/store"
    SimilarityOps.writeIvfPartitioned(emb, "vec_id", "embedding", cents, dir)
    val query = emb.where($"vec_id" === 3)
      .select($"embedding").as[Seq[Float]].head
    // what a consumer gets WITHOUT dialing anything
    val served = SimilarityOps.ivfTopKPartitioned(
        spark, dir, "vec_id", "embedding", query, cents, k = 10)
      .as[(Long, Double)].collect().toSeq
    // the q197 candidate rule in the ivfProbe spelling: the query
    // row's probe set at np IS ivfCellOf(query).take(np) (the
    // evaluator-equivalence contract above), candidates = rows whose
    // OWN cell is in it, exact 6-dp cosine top-k over the candidates
    val assigned = SimilarityOps.ivfProbe(emb, "vec_id", "embedding", cents, np)
    val qcells = assigned.where($"id" === 3)
      .select($"probe_cells").as[Seq[Long]].head
    val q = lit(query.toArray)
    val expected = assigned.where($"cell".isin(qcells: _*))
      .select($"id", round(SimilarityOps.cosine($"vec", q), 6).as("cosine"))
      .orderBy($"cosine".desc, $"id").limit(10)
      .as[(Long, Double)].collect().toSeq
    assert(served == expected,
      s"store default dial drifted from the declared operating point: " +
        s"served=${served.take(5)} expected=${expected.take(5)}")
    // and the explicit spelling of the same dial is identical
    val explicit = SimilarityOps.ivfTopKPartitioned(
        spark, dir, "vec_id", "embedding", query, cents, k = 10, nprobe = np)
      .as[(Long, Double)].collect().toSeq
    assert(served == explicit)
  }

  test("selfScalingPlanes: integer-exact ceil(log2 n) with floor and ceiling") {
    import SimilarityOps.selfScalingPlanes
    assert(selfScalingPlanes(0) == 8 && selfScalingPlanes(1) == 8)
    assert(selfScalingPlanes(256) == 8)   // floor binds through 2^8
    assert(selfScalingPlanes(257) == 9)   // first count past the floor
    assert(selfScalingPlanes(512) == 9)   // exact power: ceil(log2)=9
    assert(selfScalingPlanes(513) == 10)
    assert(selfScalingPlanes(2000) == 11)   // sf0.1 corpus
    assert(selfScalingPlanes(20000) == 15)  // 10x replica
    assert(selfScalingPlanes(1L << 40) == 40)
    assert(selfScalingPlanes(Long.MaxValue) == 62) // bucket stays a Long
    assert(selfScalingPlanes(100, minPlanes = 4) == 7)
    // the law the spelling exists for: 2^planes >= n, so the expected
    // in-bucket pair stream n²/2^planes <= n
    Seq(1L, 300L, 2000L, 20000L, 1L << 20).foreach { n =>
      assert(math.pow(2.0, selfScalingPlanes(n)) >= n)
    }
  }

  test("bucketedNeighborPairsAuto ≡ bucketedNeighborPairs at the count-derived width") {
    val emb = embeddings
    val n = emb.count()
    val planes = SimilarityOps.selfScalingPlanes(n)
    val auto = SimilarityOps.bucketedNeighborPairsAuto(
        emb, "vec_id", "embedding", minCosine = 0.2)
      .orderBy($"id_a", $"id_b")
      .as[(Long, Long, Double)].collect().toSeq
    val explicit = SimilarityOps.bucketedNeighborPairs(
        emb, "vec_id", "embedding", planes, minCosine = 0.2)
      .orderBy($"id_a", $"id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(auto == explicit)
    // pairs never cross the derived buckets
    val dims = emb.select($"embedding").as[Seq[Float]].head.size
    val buckets = emb.select($"vec_id",
        SimilarityOps.srpBucket($"embedding", planes, dims).as("b"))
      .as[(Long, Long)].collect().toMap
    auto.foreach { case (a, b, _) => assert(buckets(a) == buckets(b)) }
  }

  test("degenerate rows under semDedupTwoLevel: the oracle-divergence boundary, pinned") {
    // The duckTwoLevelAssign oracle (SparkEntry) carries the seeds'
    // degenerate-vector exclusion but ASSUMES a clean corpus
    // downstream: a NULL vector there scores NULL against every
    // centroid and DuckDB's rank tie-break (dot DESC, cid) would
    // hand it the LOWEST cid — a real cell — where the engine emits
    // the −1 sentinel. The divergence is documented prose; this case
    // makes the engine half of the boundary executable: sentinel,
    // not cell 0, and the documented −1 CO-BLOCK semantics.
    val dim = embeddings.select($"embedding").as[Seq[Float]].head.size
    val degen = Seq(
      (9000001L, null.asInstanceOf[Seq[Float]]),   // NULL vector
      (9000002L, null.asInstanceOf[Seq[Float]]),   // second NULL: co-blocks
      (9000003L, Seq.fill(dim + 1)(1.0f)),         // mismatched dims,
      (9000004L, Seq.fill(dim + 1)(1.0f))          // identical pair
    ).toDF("vec_id", "embedding")
    val aug = embeddings.select($"vec_id", $"embedding").unionByName(degen)
    val out = SimilarityOps.semDedupTwoLevel(aug, "vec_id", "embedding",
        threshold = 0.3)
      .select($"id", $"cell", $"kept").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // engine: sentinel cell, NOT the cell-0 the oracle tie-break
    // would assign a NULL-scored row
    Seq(9000001L, 9000002L, 9000003L, 9000004L).foreach { id =>
      assert(out(id)._1 == -1L, s"id=$id cell=${out(id)._1} (want sentinel)")
      assert(out(id)._1 != 0L, "sentinel must differ from the oracle's tie-break cell")
    }
    // caveat semantics in the flesh: NULL vectors co-block but a NULL
    // cosine never clears the threshold — both kept; two
    // dimension-mismatched rows sharing the (wrong) −1 block score a
    // real prefix cosine (1.0 here) — the larger id drops
    assert(out(9000001L)._2 && out(9000002L)._2,
      "NULL-vector rows must survive (NULL cosine clears no threshold)")
    assert(out(9000003L)._2 && !out(9000004L)._2,
      "identical mismatched-dim rows co-block: larger id drops")
    // and the clean-corpus rows are untouched by the augmentation
    val clean = SimilarityOps.semDedupTwoLevel(
        embeddings.select($"vec_id", $"embedding"), "vec_id", "embedding",
        threshold = 0.3)
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    embeddings.select($"vec_id").as[Long].collect().foreach { id =>
      assert(clean(id) == out(id)._2, s"id=$id keep decision drifted")
    }
  }
}
