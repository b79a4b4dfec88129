package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, TrainingDataOps}

/** Training-data pipeline ops: dedup (MinHash+LSH, SimHash, n-gram
  * Jaccard), fingerprinting, language ID, embedding near-dup, multimodal
  * plumbing — verified on planted near/exact duplicates (the driver
  * tables carry none).
  */
class TrainingDataOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the old river bank tonight"), // near-dup of 0
    (2L, "completely different content about distributed query engines and shuffle planning"),
    (3L, "der hund läuft und das ist nicht ein problem für die katze und der vogel"),
    (4L, "le chat est une belle créature et la maison est grande mais pas que petite"),
    (5L, "el perro es una mascota y los gatos son como una familia no muy grande"),
    (6L, "the quick brown fox jumps over the lazy dog near the old river bank today")) // exact dup of 0
    .toDF("doc_id", "text")

  test("minhash: identical texts get identical signatures; near-dups agree on most") {
    val sigs = TrainingDataOps.minhashSignatures(base).collect()
      .map(r => r.getLong(0) -> (0 until 8).map(j => r.getAs[Long](s"sig_$j")))
      .toMap
    assert(sigs(0L) == sigs(6L), "exact dup ⇒ identical signature")
    val agree01 = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree01 >= 6, s"near-dup agrees on most minhashes (got $agree01/8)")
    assert(agree02 < agree01, "unrelated doc agrees less")
  }

  test("minhash LSH pairs find the planted duplicates without a cross join") {
    val pairs = TrainingDataOps.minhashLshPairs(base, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 6L)), "exact dup pair found")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 6L)), "near-dup pair found")
    assert(!pairs.contains((3L, 4L)), "unrelated docs not paired")
  }

  test("LSH bucket cap drops degenerate hot buckets") {
    val many = (0L until 200L).map(i => (i, "same same same text")).toDF("doc_id", "text")
    val capped = TrainingDataOps.minhashLshPairs(many, "doc_id", maxBucketSize = 64)
    assert(capped.count() == 0, "200-doc bucket exceeds the cap and is dropped")
    val uncapped = TrainingDataOps.minhashLshPairs(many, "doc_id", maxBucketSize = 1000)
    assert(uncapped.count() == 200L * 199L / 2)
  }

  test("simhash: hamming distance separates near-dups from unrelated docs") {
    val sh = TrainingDataOps.simhash16(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(6L)) == 0)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
  }

  test("ngram jaccard: exact dup = 1.0, near-dup high, unrelated = 0.0") {
    val pairs = Seq((0L, 6L), (0L, 1L), (0L, 2L)).toDF("id_a", "id_b")
    val j = TrainingDataOps.ngramJaccard(base, pairs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(j((0L, 6L)) == 1.0)
    assert(j((0L, 1L)) > 0.7)
    assert(j((0L, 2L)) == 0.0)
  }

  test("fingerprint: content-identical docs collide, others do not") {
    val fp = TrainingDataOps.fingerprint(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    assert(fp(0L) == fp(6L))
    assert(fp(0L) != fp(1L) && fp(0L) != fp(2L))
  }

  test("language id picks the lexicon-majority language") {
    val got = TrainingDataOps.langId(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(got(0L) == "en" && got(2L) == "en")
    assert(got(3L) == "de")
    assert(got(4L) == "fr")
    assert(got(5L) == "es")
  }

  test("embedding near-dup finds planted high-cosine pair within sign bucket") {
    val v1 = Array.tabulate(16)(i => 1.0f / math.sqrt(16).toFloat)
    val v2 = v1.clone(); v2(15) = v2(15) * 0.8f // near-dup of v1
    val v3 = Array.tabulate(16)(i => (if (i % 2 == 0) 1.0f else -1.0f) / 4.0f)
    val df = Seq((0L, v1.toSeq), (1L, v2.toSeq), (2L, v3.toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val nd = TrainingDataOps.embeddingNearDup(df, "vec_id", 0.95).collect()
    assert(nd.length == 1)
    assert(nd(0).getLong(0) == 0L && nd(0).getLong(1) == 1L)
    assert(nd(0).getAs[Double]("cosine") > 0.99)
  }

  test("k-means IVF: trained centroids separate planted clusters; top-k finds the query's cluster") {
    // two tight clusters around orthogonal directions, membership by id
    // parity so the k-means seeds (vids 1 and 2) start one per cluster;
    // the query (vid 0, even) is in cluster A
    def jig(i: Long, d: Int): Float = ((i * 31 + d * 7) % 5).toFloat / 100f
    val vecs = (0L until 24L).map { i =>
      val inA = i % 2 == 0
      (i, Array.tabulate(16) { d =>
        (if (inA == (d < 8)) 0.5f else 0.01f) + jig(i, d)
      }.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val top = TrainingDataOps.ivfKMeansTopK(
      df, "vec_id", queryId = 0L, k = 5, nCentroids = Some(2), nProbe = Some(1), iters = 2)
      .collect()
    assert(top.length == 5)
    // with 1 probe, all results come from the query's own (A = even) cluster
    top.foreach(r => assert(r.getLong(0) % 2 == 0, s"cluster A only: ${r.getLong(0)}"))
    assert(top.forall(_.getAs[Double]("cosine") > 0.9))
    // determinism: same input ⇒ identical result
    val again = TrainingDataOps.ivfKMeansTopK(
      df, "vec_id", queryId = 0L, k = 5, nCentroids = Some(2), nProbe = Some(1), iters = 2)
      .collect()
    assert(top.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("batched IVF probe: each query's top-k equals its single-query run") {
    import spark.implicits._
    def jig(i: Long, d: Int): Float = ((i * 31 + d * 7) % 5).toFloat / 100f
    val vecs = (0L until 40L).map { i =>
      val inA = i % 2 == 0
      (i, Array.tabulate(16) { d =>
        (if (inA == (d < 8)) 0.5f else 0.01f) + jig(i, d)
      }.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val qids = Seq(0L, 7L, 20L).toDF("qid")
    val batch = TrainingDataOps.ivfBatchTopK(
      df, "vec_id", qids, k = 4, nCentroids = Some(4), nProbe = Some(2))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(batch.map(_._1).distinct.sorted.toSeq == Seq(0L, 7L, 20L),
      "every query answered")
    for (q <- Seq(0L, 7L, 20L)) {
      val single = TrainingDataOps.ivfTopK(
        df, "vec_id", queryId = q, k = 4, nCentroids = Some(4), nProbe = Some(2))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val mine = batch.filter(_._1 == q).sortBy(_._2)
        .map(r => (r._3, r._4)).toSeq
      assert(mine.toSet == single.toSet,
        s"batched result for query $q equals the single-query probe: $mine vs $single")
    }
  }

  test("IVF cell count derives toward √n when not pinned (two sizes)") {
    // the documented scale default (VERDICT r4 item 4)
    assert(TrainingDataOps.ivfDefaultCells(64L) == 8)
    assert(TrainingDataOps.ivfDefaultCells(256L) == 16)
    assert(TrainingDataOps.ivfDefaultCells(1L) == 1)
    // end-to-end with the derived default at two table sizes: the same
    // code path, different cell counts, still returns a full top-k
    def table(n: Int) = (0L until n.toLong).map(i =>
      (i, Array.tabulate(8)(d => (((i * 13 + d * 5) % 17) + 1).toFloat / 18f).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    for (n <- Seq(25, 100)) {
      val top = TrainingDataOps.ivfTopK(table(n), "vec_id", queryId = 0L, k = 3)
        .collect()
      assert(top.length == 3, s"n=$n returns a full top-k on derived cells")
      assert(top.forall(_.getLong(0) != 0L))
    }
  }

  test("multimodal: frame sampling and feature stubs keep shape and determinism") {
    val media = Multimodal.syntheticMedia(spark, 10, seed = 7)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload", "meta"))
    assert(media.select(length(col("payload"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(128), "4 x 32-byte pseudo-frames")
    val frames = Multimodal.frameSample(media)
    assert(frames.count() == 40)
    assert(frames.select(length(col("frame"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(32))
    val every2 = Multimodal.frameSample(media, everyKth = 2)
    assert(every2.count() == 20)
    val feats = Multimodal.extractFeaturesStub(frames)
    assert(feats.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
    // determinism
    val a = Multimodal.frameSample(Multimodal.syntheticMedia(spark, 10, seed = 7))
      .select(hex(col("frame"))).collect().map(_.getString(0)).sorted
    val b = frames.select(hex(col("frame"))).collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    val resized = Multimodal.resizeStub(media, 64, 64)
    assert(resized.select(col("meta.width")).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64))
  }

  test("connected components: a long chain (the adversarial case for label propagation) converges to the minimum root") {
    // a 64-node path has diameter 63 — naive min-label propagation needs
    // 63 rounds; large-star/small-star must finish inside the 25-round cap.
    // localFinishEdges = 0 forces the all-distributed path (the thing
    // under test here).
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = TrainingDataOps
      .connectedComponents(pairs, localFinishEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (1L to 64L).toSet, "every node of the graph is labeled")
    assert(labels.values.forall(_ == 1L), "one component rooted at the minimum id")
    spark.catalog.clearCache()
  }

  test("connected components: empty pair set yields an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TrainingDataOps.connectedComponents(empty).isEmpty)
    spark.catalog.clearCache()
  }

  test("connected components match a union-find ground truth on seeded random graphs") {
    val rnd = new scala.util.Random(12345)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comp = (0 until n).groupBy(find).iterator
        .flatMap { case (_, ms) => val m = ms.min.toLong; ms.map(_ -> m) }.toMap
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = nodes.map(x => x -> comp(x.toInt)).toMap
      // both phases must agree with the ground truth: the all-distributed
      // star-contraction path AND the bounded local union-find finish
      for (thresholdEdges <- Seq(0L, 1L << 20)) {
        val labels = TrainingDataOps
          .connectedComponents(edges.toDF("id_a", "id_b"),
            localFinishEdges = thresholdEdges)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(labels == expected,
          s"trial $trial threshold $thresholdEdges: $labels vs $expected")
        spark.catalog.clearCache()
      }
    }
  }

  test("connected components: hybrid path — distributed contraction shrinks cliques under the local bound, local finish completes them") {
    // 3 disjoint 12-cliques = 198 edges > threshold 50; one star round
    // contracts each clique toward its star (~11 edges each), dropping
    // under the bound so the local union-find finishes the job
    val pairs = (0 until 3).flatMap { c =>
      val ids = (0 until 12).map(i => (c * 100 + i).toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toDF("id_a", "id_b")
    val labels = TrainingDataOps
      .connectedComponents(pairs, localFinishEdges = 50L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 36, "all 36 clique members labeled")
    assert((0 until 3).forall { c =>
      (0 until 12).forall(i => labels((c * 100 + i).toLong) == c * 100L)
    }, s"each clique rooted at its minimum id: $labels")
    spark.catalog.clearCache()
  }

  test("near-dup clusters: the planted dup family collapses to one canonical keep") {
    val out = TrainingDataOps.nearDupClusters(base, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 6L), s"exactly the planted near/exact dups cluster: $out")
    assert(out.values.map(_._1).toSet == Set(0L), "cluster id is the minimum doc id")
    assert(out.values.map(_._2).toSet == Set(3L), "cluster size counts all members")
    assert(out.filter(_._2._3).keySet == Set(0L), "only the canonical doc is kept")
    spark.catalog.clearCache()
  }

  test("stratified hash sampling: deterministic, rate-respecting, salt-sensitive") {
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 100)
    val s1 = TrainingDataOps.stratifiedSample(docs, rates, defaultPermille = 500)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val s2 = TrainingDataOps.stratifiedSample(docs, rates, defaultPermille = 500)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.sorted.sameElements(s2.sorted), "same salt+rates => same sample")
    assert(s1.forall { case (_, l, b) => b < (if (l == "en") 100 else 500) },
      "every surviving bucket is under its stratum's rate")
    // a 100‰/500‰ split over 200 docs each: en strictly fewer than de
    val byLang = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("en", 0) < byLang("de"),
      s"rates order the strata sizes: $byLang")
    val s3 = TrainingDataOps
      .stratifiedSample(docs, rates, defaultPermille = 500, salt = "other")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!s3.sorted.sameElements(s1.sorted), "a different salt reselects")
  }

  test("rebalance sampling: strata converge to the smallest, min stratum fully kept, deterministic") {
    // 2000/500/100 docs: rates 50k/200k/1000k ppm, target ~100 each
    val docs = ((0L until 2000L).map(i => (i, "en")) ++
      (2000L until 2500L).map(i => (i, "de")) ++
      (2500L until 2600L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
    val s1 = TrainingDataOps.rebalanceSample(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val s2 = TrainingDataOps.rebalanceSample(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.sorted.sameElements(s2.sorted), "deterministic resample")
    val byLang = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("fr") == 100, s"smallest stratum keeps everything: $byLang")
    // the quadratic bucket remix keeps realized sizes near the target —
    // the raw linear bucket measured 2.3x off on clustered ids
    for (l <- Seq("en", "de"))
      assert(byLang(l) >= 75 && byLang(l) <= 125,
        s"$l realized size near the 100-doc target: $byLang")
  }

  test("sampling bucket: quadratic remix spreads clustered consecutive ids") {
    // 10k consecutive ids at an effective 250 permille rate: the linear
    // bucket walks stride-1 runs; the remix must land within 6% of fair
    val docs = (0L until 10000L).map(i => (i, "x")).toDF("doc_id", "lang")
    val kept = TrainingDataOps
      .stratifiedSample(docs, Map.empty, defaultPermille = 250)
      .count()
    assert(kept >= 2350 && kept <= 2650, s"kept $kept of expected ~2500")
  }

  test("hash quality classifier: dim-1 collapses to the known weight; deterministic and bounded") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"), (2L, "x"))
      .toDF("doc_id", "text")
    // dim = 1: every token hits w(0) = 123/1997 - 0.5, so every logit is
    // exactly that value regardless of content
    val w0 = 123.0 / 1997.0 - 0.5
    val one = TrainingDataOps.hashQualityScore(docs, dim = 1)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val exp = math.rint(w0 * 1e6) / 1e6
    assert(one.values.forall { case (l, k) => l == exp && !k },
      s"dim-1 logit = w0 for every doc: $one vs $exp")
    // dim = 64: identical text => identical score; logit stays in [-1/2, 1/2]
    val out = TrainingDataOps.hashQualityScore(docs, dim = 64)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out(0L) == out(1L), s"same text, same score: $out")
    assert(out.values.forall { case (l, k) =>
      l >= -0.5 && l <= 0.5 && k == (l >= 0) }, s"bounded + keep-consistent: $out")
  }

  test("budget select: threshold-bin plan equals the flat windowed prefix") {
    val docs = Seq(
      (0L, "a b c d"),        // score 4, tokens 4
      (1L, "a b c a b c"),    // score 3, tokens 6
      (2L, "x y z"),          // score 3, tokens 3
      (3L, "p q"),            // score 2, tokens 2
      (4L, ""))               // dropped
      .toDF("doc_id", "text")
    // order: (4,id0)(3,id1)(3,id2)(2,id3); cums 4,10,13,15
    def ids(b: Long) = TrainingDataOps.budgetSelect(docs, b)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(15) == Seq(0L, 1L, 2L, 3L), "everything fits")
    assert(ids(13) == Seq(0L, 1L, 2L), "crossing drops the tail bin")
    // budget 9: doc1 (cum 10) crosses INSIDE bin 3 — doc2 must also be
    // excluded even though 4+3 <= 9 (prefix, not knapsack)
    assert(ids(9) == Seq(0L), "prefix semantics inside the threshold bin")
    assert(ids(12) == Seq(0L, 1L), "partial threshold bin keeps its doc_id-prefix")
    assert(ids(3) == Seq(), "budget under the top bin keeps nothing")
    val out = TrainingDataOps.budgetSelect(docs, 13)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 6L)) && out(0L) == ((4L, 4L)), s"score/tokens: $out")
  }

  test("budget select: uniform-score corpus (whole corpus IS the threshold bin) " +
      "selects the exact doc_id prefix across range shards") {
    // 200 docs, all score 2 / 2 tokens — the degenerate case where the
    // threshold bin is the ENTIRE corpus; ids are sparse (stride 7) so
    // the 64 id-range shards are uneven. Budget 101 tokens keeps the
    // first 50 docs (cum 100) and must cut exactly at the prefix even
    // though the crossing shard is mid-corpus.
    val docs = (0 until 200).map(i => (i * 7L, "t" + i + " u" + i))
      .toDF("doc_id", "text")
    // cutoff 0 forces the SHARDED path (the default flat path is the
    // bounded-bin case); both must select the identical prefix
    val sharded = TrainingDataOps.budgetSelect(docs, 101L, shardRowsCutoff = 0L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val flat = TrainingDataOps.budgetSelect(docs, 101L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sharded == (0 until 50).map(_ * 7L).toSeq,
      s"prefix of 50 uniform-score docs expected, got ${sharded.length}: $sharded")
    assert(flat == sharded, "flat and sharded paths must agree")
  }

  test("source cap keeps the k lowest ids per source") {
    val docs = Seq(
      (5L, "a"), (1L, "a"), (3L, "a"), (2L, "b"), (9L, "b"))
      .toDF("doc_id", "source")
    val out = TrainingDataOps.sourceCap(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a", 1L), (3L, "a", 2L), (2L, "b", 1L), (9L, "b", 2L)),
      s"got $out")
  }

  test("source cap: bounded aggregate equals the row_number restatement on a skewed corpus") {
    // one mega source (5000 docs, non-contiguous ids) + a tiny one: the
    // aggregate plan must reproduce the windowed rank exactly.
    val docs = ((0 until 5000).map(i => (i.toLong * 3 + 1, "mega")) ++
      Seq((20000L, "tiny"), (20001L, "tiny"))).toDF("doc_id", "source")
    docs.createOrReplaceTempView("sc_docs")
    val out = TrainingDataOps.sourceCap(docs, k = 22)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expected = spark.sql(
      """SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM sc_docs) WHERE rn <= 22""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == expected, "aggregate plan must equal the windowed rank")
    assert(out.count(_._2 == "mega") == 22 && out.count(_._2 == "tiny") == 2)
  }

  test("min-k heap buffer: k=1, duplicates, rejection, merge and ser/deser round-trip") {
    import graft.expressions.MinKHeap
    // k=1 keeps the single minimum
    val b1 = MinKHeap.create(1)
    Seq(5L, 3L, 9L, 3L).foreach(MinKHeap.add(b1, 1, _))
    assert(b1.n == 1 && b1.heap(0) == 3L)
    // duplicates are separate entries (multiset = first k of a sort);
    // values >= a full buffer's max are rejected
    val b2 = MinKHeap.create(3)
    Seq(7L, 7L, 9L, 7L, 8L).foreach(MinKHeap.add(b2, 3, _))
    assert(java.util.Arrays.copyOf(b2.heap, b2.n).sorted.toSeq == Seq(7L, 7L, 7L))
    // deserialized buffers keep accepting inserts (grow path) and merge
    // like the originals
    val b3 = MinKHeap.deser(MinKHeap.ser(MinKHeap.create(4)))
    Seq(10L, 2L).foreach(MinKHeap.add(b3, 4, _))
    val b4 = MinKHeap.deser(MinKHeap.ser(b3))
    MinKHeap.add(b4, 4, 6L)
    MinKHeap.merge(b4, 4, b2)
    assert(java.util.Arrays.copyOf(b4.heap, b4.n).sorted.toSeq == Seq(2L, 6L, 7L, 7L),
      "merge keeps the 4 smallest across both buffers")
  }

  test("corpus retain: threshold path equals the window restatement incl. mega source and NULL lang") {
    // hot source with 200 cap-eligible docs (cap 5), a dup-dropped doc,
    // NULL-lang rows planted BELOW and ABOVE the cap threshold (the
    // three-valued edge: retain NULL + 'retained' below, false +
    // 'source_cap' above), and a cold source.
    val rows = (0 until 200).map(i =>
      (100L + i, s"tok$i alpha beta gamma", "en", "hot")) ++ Seq(
      (99L, "omega psi chi phi", null.asInstanceOf[String], "hot"),
      (500L, "upsilon rho sigma tau", null.asInstanceOf[String], "hot"),
      (501L, "uno dos tres cuatro", "en", "cold"),
      (502L, "tiny", "en", "cold"))
    val docs = rows.toDF("doc_id", "text", "lang", "source")
    val dupTbl = Seq((100L, false), (501L, true)).toDF("doc_id", "keep")
    docs.createOrReplaceTempView("cr_docs")
    dupTbl.createOrReplaceTempView("cr_dup")
    val out = TrainingDataOps.corpusRetain(docs, keepLangs = Seq("en"),
      minTokens = 3, maxTokens = 50, capPerSource = 5, dupKeep = Some(dupTbl))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "materialized-dupKeep path must not plan a per-source window")
    val expected = spark.sql(
      """WITH staged AS (
        |  SELECT d.doc_id, d.lang, d.source,
        |    coalesce(p.keep, TRUE) AS dup_ok,
        |    d.lang IN ('en') AS lang_ok,
        |    size(split(trim(d.text), '\\s+')) BETWEEN 3 AND 50 AS quality_ok
        |  FROM cr_docs d LEFT JOIN cr_dup p USING (doc_id)),
        |cum AS (
        |  SELECT *, sum(CASE WHEN dup_ok AND lang_ok AND quality_ok
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM staged)
        |SELECT doc_id, lang, source, dup_ok, lang_ok, quality_ok,
        |  (dup_ok AND lang_ok AND quality_ok AND cum <= 5) AS retain,
        |  CASE WHEN NOT dup_ok THEN 'dup' WHEN NOT lang_ok THEN 'lang'
        |    WHEN NOT quality_ok THEN 'quality'
        |    WHEN cum > 5 THEN 'source_cap'
        |    ELSE 'retained' END AS reason FROM cum""".stripMargin)
    assert(out.collect().toSet == expected.collect().toSet,
      "threshold path must equal the window restatement row-for-row")
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(99L).isNullAt(6) && byId(99L).getString(7) == "retained",
      "NULL-lang row under the cap keeps retain=NULL + 'retained'")
    assert(!byId(500L).isNullAt(6) && !byId(500L).getBoolean(6) &&
      byId(500L).getString(7) == "source_cap",
      "NULL-lang row past the threshold is false + 'source_cap'")
  }

  test("corpus retain: each stage drops its planted doc with the right reason") {
    // base near-dup fixture docs 0/1/6 cluster (keep = 0); add a zh doc,
    // a too-short doc, and enough passing docs on one source to trip a
    // cap of 2. Every text is >= minTokens=3 tokens unless planted short.
    // The s2 texts must be pairwise DISSIMILAR (no shared shingles) or
    // the near-dup stage clusters them before the cap can fire.
    val docs = Seq(
      (0L, base.where(col("doc_id") === 0).select("text").head.getString(0), "en", "s1"),
      (1L, base.where(col("doc_id") === 1).select("text").head.getString(0), "en", "s1"),
      (6L, base.where(col("doc_id") === 6).select("text").head.getString(0), "en", "s1"),
      (10L, "alpha beta gamma delta epsilon one", "zh", "s2"),
      (11L, "tiny", "en", "s2"),
      (12L, "crimson harbors echo beneath winter lanterns", "en", "s2"),
      (13L, "quartz meridian folds upward across silent dunes", "en", "s2"),
      (14L, "velvet engines hum inside forgotten orchards", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainingDataOps.corpusRetain(docs,
      keepLangs = Seq("en"), minTokens = 3, maxTokens = 50, capPerSource = 2)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(6), r.getString(7)))).toMap
    assert(out(0L) == ((true, "retained")), s"canonical dup kept: $out")
    assert(out(1L) == ((false, "dup")) && out(6L) == ((false, "dup")),
      s"non-canonical cluster members dropped as dup: $out")
    assert(out(10L) == ((false, "lang")), s"zh doc dropped at the lang gate: $out")
    assert(out(11L) == ((false, "quality")), s"short doc dropped at quality: $out")
    assert(out(12L) == ((true, "retained")) && out(13L) == ((true, "retained")),
      s"first two passing docs of s2 retained: $out")
    assert(out(14L) == ((false, "source_cap")),
      s"third passing doc of s2 dropped by the cap: $out")
    spark.catalog.clearCache()
  }

  test("repetition stats: hand-checked trigram ratios incl. the short-doc guard") {
    val docs = Seq(
      (0L, "x y x y x y"),                 // grams xyx,yxy,xyx,yxy: 4 total, 2 distinct
      (1L, "a b"),                         // < 3 tokens: zero grams
      (2L, "one two three four five"))     // all distinct
      .toDF("doc_id", "text")
    val out = TrainingDataOps.repetitionStats(docs, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((4L, 2L, 0.5)), s"planted repeat: $out")
    assert(out(1L) == ((0L, 0L, 0.0)), s"short doc guard: $out")
    assert(out(2L) == ((3L, 3L, 0.0)), s"all-distinct doc: $out")
  }

  test("contamination check: planted eval overlap counted, clean and short docs zero") {
    val train = Seq(
      (2L, "one two three four five"),  // shares 2 distinct trigrams with eval
      (3L, "alpha two three four omega"), // shares 1
      (4L, "completely different words here"),
      (5L, "zz"))                        // < 3 tokens
      .toDF("doc_id", "text")
    val evalSet = Seq((97L, "one two three four")).toDF("doc_id", "text")
    val out = TrainingDataOps.contaminationCheck(train, evalSet, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(2L) == ((2L, true)), s"two leaked trigrams: $out")
    assert(out(3L) == ((1L, true)), s"one leaked trigram: $out")
    assert(out(4L) == ((0L, false)) && out(5L) == ((0L, false)),
      s"clean + short docs report zero: $out")
  }

  test("crossdoc dup stats: shared 5-gram positions counted with multiplicity; short-doc guard") {
    val docs = Seq(
      (0L, "a b c d e f"),              // grams abcde,bcdef
      (1L, "a b c d e zz"),             // shares abcde with 0 and 4
      (2L, "q r s t u v w"),            // 3 grams, none shared
      (3L, "x y"),                      // < 5 tokens: zero grams
      (4L, "a b c d e f a b c d e"))    // abcde at pos 0 AND 6, bcdef at 1
      .toDF("doc_id", "text")
    val out = TrainingDataOps.crossdocDupStats(docs, n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((2L, 2L, 1.0)), s"both grams of doc0 shared: $out")
    assert(out(1L) == ((2L, 1L, 0.5)), s"doc1 shares only abcde: $out")
    assert(out(2L) == ((3L, 0L, 0.0)), s"unshared doc: $out")
    assert(out(3L) == ((0L, 0L, 0.0)), s"short-doc guard: $out")
    assert(out(4L) == ((7L, 3L, 0.42857)),
      s"positions counted with multiplicity (abcde twice + bcdef): $out")
  }

  test("unigram logprob: hand-computed means, OOV floor, empty docs dropped") {
    val docs = Seq(
      (0L, "a a b"), (1L, "a b c"), (2L, ""))
      .toDF("doc_id", "text")
    // corpus: a x3, b x2, c x1, N = 6; vocabSize=2 => vocab {a: 1/2, b: 1/3},
    // c is OOV at floor 1/6
    val out = TrainingDataOps.unigramLogProb(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r5(x: Double) = math.rint(x * 1e5) / 1e5
    assert(out.size == 2 && !out.contains(2L), s"empty doc dropped: $out")
    assert(out(0L) == ((3L, r5((2 * math.log(2.0) + math.log(3.0)) / 3))),
      s"doc0 mean -ln p: $out")
    assert(out(1L) == ((3L,
      r5((math.log(2.0) + math.log(3.0) + math.log(6.0)) / 3))),
      s"doc1 exercises the OOV floor: $out")
  }

  test("chunk documents: coverage without redundant tails, short last chunk, empty doc dropped") {
    val t12 = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, t12),                               // 12 toks: starts 0,3,6,9
      (1L, "a b c d e"),                       // exactly one chunk
      (2L, "a b c d e f"),                     // second chunk adds 1 new token
      (3L, ""))                                // dropped
      .toDF("doc_id", "text")
    val out = TrainingDataOps.chunkDocuments(docs, chunkSize = 5, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out.keys.count(_._1 == 0L) == 4, s"12 tokens, stride 3: 4 chunks: $out")
    assert(out((0L, 0L)) == ((5L, "t1 t2 t3 t4 t5")), s"first window: $out")
    assert(out((0L, 3L)) == ((3L, "t10 t11 t12")), s"short tail covers the end: $out")
    assert(out.keys.count(_._1 == 1L) == 1, s"exact-fit doc: one chunk: $out")
    assert(out((2L, 1L)) == ((3L, "d e f")), s"overlap window: $out")
    assert(!out.keys.exists(_._1 == 3L), s"empty doc produces no chunks: $out")
  }

  test("pii redact: rule order applies, all matches rewritten, clean text unchanged") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    val phone = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"
    val docs = Seq(
      (1L, "mail a.b+c@example.com and b@host.test ssn 123-45-6789 tel 555-123-4567 x"),
      (2L, "clean text no pii at all"))
      .toDF("doc_id", "text")
    val out = TrainingDataOps.piiRedact(docs,
      Seq(email -> "[EMAIL]", ssn -> "[SSN]", phone -> "[PHONE]"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail [EMAIL] and [EMAIL] ssn [SSN] tel [PHONE] x",
      s"got ${out(1L)}")
    assert(out(2L) == "clean text no pii at all")
  }

  test("Misra-Gries candidates: above-threshold token survives any partitioning; buffer bounded") {
    // N = 560, k = 16 => max undercount N/(k+1) = 32.9 < 60: 'hot' MUST
    // survive no matter how the rows are partitioned or merged
    val rows = Seq.fill(60)("hot") ++ (0 until 500).map(i => s"cold$i")
    for (parts <- Seq(1, 3, 13)) {
      val cands = rows.toDF("token").repartition(parts)
        .agg(graft.expressions.MisraGriesAgg.candidates(col("token"), 16))
        .head().getSeq[String](0)
      assert(cands.contains("hot"), s"parts=$parts lost the heavy hitter")
      assert(cands.length <= 32, s"parts=$parts buffer bound 2k violated: ${cands.length}")
    }
  }

  test("Misra-Gries text aggregate: exact counters below capacity; tokenization matches split-explode") {
    // vocabulary < k => no prune ever fires => counters are EXACT and
    // must equal the explode(split(text,' ')) ground truth, including
    // the multi-space / leading / trailing empty-token skips
    val docs = Seq(
      "alpha  beta alpha", " beta gamma ", "alpha", "", "  ")
      .toDF("text").repartition(3)
    val got = docs
      .agg(graft.expressions.MisraGriesAgg.textColumn(col("text"), 16))
      .head().getMap[String, Long](0)
    val exact = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.toMap == exact, s"got $got vs exact $exact")
    assert(exact == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L))
  }

  test("heavy hitters: exact counts survive MG pruning across partitions") {
    // 1003 distinct tokens vs a 58-entry MG buffer (k=29): pruning fires
    // constantly, yet the exact second pass recovers precise counts.
    // N = 1620, threshold = ceil(0.07*1620) = 114
    val rows = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(120)("gamma") ++ (0 until 1000).map(i => s"tail$i")
    val docs = rows.grouped(10).map(_.mkString(" ")).toSeq
      .toDF("text").repartition(7)
    val out = TrainingDataOps.heavyHitterTokens(docs, minFreq = 0.07)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alpha" -> 300L, "beta" -> 200L, "gamma" -> 120L),
      s"got $out")
  }

  test("token-count quantiles: integer histogram rule, hand-checked per language") {
    // tokens chosen OUTSIDE every language lexicon ('y' is Spanish, 'a'
    // and 'is' are English — single letters are not safe fillers here)
    val docs = Seq(
      (1L, "t1 t2 t3"), (2L, "t1 t2 t3 t4"), (3L, "t1 t2 t3 t4 t5"),
      (4L, "t1 t2"), (5L, "t1 t2 t3 t4 t5 t6 t7"),
      (6L, "der hund und das ist nicht ein gut für die katze heute"))
      .toDF("doc_id", "text")
    val out = TrainingDataOps.tokenCountQuantiles(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en token counts {2,3,4,5,7}: p50 = first cum*100 >= 50*5 -> 4;
    // p90/p99 -> 7 (cum must reach 4.5/4.95 of 5)
    assert(out("en") == ((5L, 4L, 7L, 7L)), s"en quantiles: ${out("en")}")
    assert(out("de") == ((1L, 12L, 12L, 12L)), s"de singleton: ${out("de")}")
  }

  test("top tokens: count-desc then token-asc gives a deterministic prefix") {
    val docs = Seq(
      (1L, "xx xx xx yy yy zz"), (2L, "yy zz ww ww"), (3L, "qq qq qq qq"))
      .toDF("doc_id", "text")
    val out = TrainingDataOps.topTokens(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._2)
    assert(out.toSeq == Seq(
      ("en", 1L, "qq", 4L), ("en", 2L, "xx", 3L), ("en", 3L, "yy", 3L)),
      s"got ${out.toSeq}")
  }

  // --- winnowing fingerprints ------------------------------------------

  private val P = 1000000007L
  private def ph(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
  /** Driver-side winnowing ground truth — same k=3 grams, w=4 minima. */
  private def winnowExpected(text: String): (Long, Long, Long) = {
    val hs = text.split(" ", -1).map(ph)
    val gs = (0 to hs.length - 3).map(i =>
      ((hs(i) * 31 + hs(i + 1)) % P * 31 + hs(i + 2)) % P)
    val fps =
      if (gs.length < 4) Seq.empty[Long]
      else (0 to gs.length - 4).map(i => gs.slice(i, i + 4).min).distinct.sorted
    (fps.length.toLong, fps.headOption.getOrElse(-1L),
      fps.foldLeft(0L)((a, x) => (a * 31 + x) % P))
  }

  test("winnowing: matches a driver-side ground truth; dups collide; short docs empty") {
    val docs = base.union(Seq(
      (7L, "only five tokens right here")).toDF("doc_id", "text"))
    val out = TrainingDataOps.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      assert(out(id) == winnowExpected(text), s"doc $id winnow mismatch")
    }
    assert(out(0L) == out(6L), "exact dup ⇒ identical fingerprint summary")
    assert(out(7L) == ((0L, -1L, 0L)), "5-token doc has no 4-gram window")
    // near-dups share fingerprints (the ≥ k+w−1 shared-run guarantee):
    // docs 0/1 differ only in the last token, so the digests differ but
    // the min fingerprint (selected from the long shared prefix) agrees.
    assert(out(0L)._2 == out(1L)._2, "near-dup shares the min fingerprint")
  }

  // --- cross-corpus near-dedup -----------------------------------------

  test("cross-corpus near-dups: new-vs-ref matches verified, intra-corpus pairs ignored") {
    val ref = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
      (2L, "completely different content about distributed query engines and shuffle planning"),
      (4L, "le chat est une belle créature et la maison est grande mais pas que petite"))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the old river bank tonight"), // near-dup of ref 0
      (102L, "the quick brown fox jumps over the lazy dog near the old river bank today"),   // exact dup of ref 0
      (103L, "an entirely fresh document with no counterpart in the reference corpus at all"),
      (104L, "an entirely fresh document with no counterpart in the reference corpus at most")) // near-dup of 103 — INTRA-new
      .toDF("doc_id", "text")
    val hits = TrainingDataOps.crossCorpusNearDups(newDocs, ref, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = hits.map(h => (h._1, h._2) -> h._3).toMap
    assert(byPair.get((102L, 0L)).contains(1.0), s"exact dup verified at 1.0: $byPair")
    assert(byPair.contains((101L, 0L)) && byPair((101L, 0L)) >= 0.8,
      s"near-dup verified above threshold: $byPair")
    assert(!hits.exists(h => h._1 == 103L || h._1 == 104L),
      "intra-new near-dup pair must NOT appear in the cross drop list")
    assert(hits.forall(h => h._1 > 100L && h._2 < 100L),
      "pairs are always (new, ref)")
  }

  // --- sequence packing -------------------------------------------------

  test("pack blocks: per-bucket running sums, block spans and offsets are exact") {
    val docs = (0L until 60L).map { id =>
      (id, Seq.fill((id % 7L).toInt + 1)("t").mkString(" "))
    }.toDF("doc_id", "text")
    val L = 8
    val out = TrainingDataOps.packBlocks(docs, blockTokens = L, buckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == 60, "every document is packed exactly once")
    out.groupBy(_._2).foreach { case (bucket, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach {
        case (id, _, nTok, first, last, off) =>
          assert(nTok == (id % 7L) + 1, s"doc $id token count")
          assert(first == cum / L, s"doc $id block_first in bucket $bucket")
          assert(last == (cum + nTok - 1) / L, s"doc $id block_last")
          assert(off == cum % L, s"doc $id block_offset")
          cum += nTok
      }
      // the bucket's stream fills blocks contiguously: the last block
      // index equals the total token count's block, wasting zero pads
      assert(rows.map(_._5).max == (cum - 1) / L,
        s"bucket $bucket final block is the ceiling of its token total")
    }
  }

  // --- tf-idf top terms --------------------------------------------------

  test("tfidf top terms: integer micro-nat ranking matches a driver-side model; df=N excluded") {
    val docs = Seq(
      (1L, "apple apple apple banana common"),
      (2L, "banana banana cherry common"),
      (3L, "cherry date date date date common"))
      .toDF("doc_id", "text")
    val out = TrainingDataOps.tfidfTopTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // driver-side ground truth with the same floor(ln(N/df)·1e6) banking
    val toks = Map(
      1L -> Seq("apple", "apple", "apple", "banana", "common"),
      2L -> Seq("banana", "banana", "cherry", "common"),
      3L -> Seq("cherry", "date", "date", "date", "date", "common"))
    val df = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val n = toks.size.toDouble
    val expected = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (tok, occ) =>
        (id, tok, occ.size.toLong, df(tok).toLong,
          occ.size * math.floor(math.log(n / df(tok)) * 1e6).toLong)
      }
    }.filter(_._5 > 0).groupBy(_._1).flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (-r._5, r._2)).take(2)
    }.toSet
    assert(out.toSet == expected, s"got ${out.toSet} exp $expected")
    assert(!out.exists(_._2 == "common"), "df = N term has idf 0 and is excluded")
    assert(out.count(_._1 == 1L) <= 2 && out.count(_._1 == 2L) <= 2, "top-k bound")
  }
  // --- content-defined chunking ------------------------------------------

  /** Driver-side CDC ground truth (k=3, same boundary rule). */
  private def cdcExpected(text: String, divisor: Int): Seq[(Long, Long, Long, Long)] = {
    val hs = text.split(" ", -1).map(ph)
    val ends = (3 to hs.length - 1).filter { i => // 1-based end positions
      (((hs(i - 3) * 31 + hs(i - 2)) % P * 31 + hs(i - 1)) % P) % divisor == 0
    }
    val bs = (0L +: ends.map(_.toLong)) :+ hs.length.toLong
    bs.sliding(2).zipWithIndex.map { case (Seq(s, e), c) =>
      (c.toLong, s, e - s,
        hs.slice(s.toInt, e.toInt).foldLeft(0L)((a, x) => (a * 31 + x) % P))
    }.toSeq
  }

  test("cdc chunks: match driver-side ground truth; chunks partition the doc") {
    val docs = base
    val out = TrainingDataOps.cdcChunks(docs, divisor = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      assert(out(id) == cdcExpected(text, 4), s"doc $id CDC mismatch")
      val chunks = out(id)
      assert(chunks.map(_._3).sum == text.split(" ", -1).length.toLong,
        s"doc $id chunks cover every token exactly once")
      chunks.sliding(2).foreach {
        case Seq((_, s1, n1, _), (_, s2, _, _)) =>
          assert(s1 + n1 == s2, s"doc $id chunks contiguous")
        case _ =>
      }
    }
  }

  test("cdc chunks are shift-resistant: a prepended token leaves downstream chunk hashes intact") {
    val body = (1 to 80).map(i => s"w${i % 13}x$i").mkString(" ")
    val docs = Seq((1L, body), (2L, "zzz " + body)).toDF("doc_id", "text")
    val hashes = TrainingDataOps.cdcChunks(docs, divisor = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val shared = hashes(1L).intersect(hashes(2L))
    assert(hashes(1L).size >= 5, s"fixture long enough to chunk: ${hashes(1L).size}")
    assert(shared.size >= hashes(1L).size - 2,
      s"only the chunk containing the edit may change (shared ${shared.size} of ${hashes(1L).size})")
  }

  test("cdc shared chunks: planted shared segment found across docs, unique segments not") {
    val seg = (1 to 40).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, seg + " tail one here"),
      (2L, "totally different head before " + seg),
      (3L, "no shared middle in this document at all body"))
      .toDF("doc_id", "text")
    val shared = TrainingDataOps.cdcSharedChunks(docs, divisor = 8).collect()
    assert(shared.nonEmpty, "the planted 40-token shared segment yields shared chunks")
    assert(shared.forall(_.getLong(2) == 2L), "only docs 1 and 2 share segments")
  }

  // --- temperature mixing --------------------------------------------------

  test("temperature mix weights: sqrt law hand-checked; alpha=1 proportional") {
    val docs = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(16)("c"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val w = TrainingDataOps.temperatureMixWeights(docs, "lang", alpha = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(w("a") == ((1L, 1.0 / 7, math.floor(1.0 / 7 * 1e6).toLong)) ||
      (w("a")._1 == 1L && math.abs(w("a")._2 - 1.0 / 7) < 1e-9), s"a: ${w("a")}")
    assert(w("b")._1 == 4L && math.abs(w("b")._2 - 2.0 / 7) < 1e-9, s"b: ${w("b")}")
    assert(w("c")._1 == 16L && math.abs(w("c")._2 - 4.0 / 7) < 1e-9, s"c: ${w("c")}")
    assert(w.values.map(_._3).sum <= 1000000L, "ppm rates never oversubscribe")
    val w1 = TrainingDataOps.temperatureMixWeights(docs, "lang", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(w1("c") - 16.0 / 21) < 1e-9, "alpha=1 is proportional")
    assert(w1("c") > w("c")._2, "alpha<1 flattens the head stratum")
  }

  // --- exact cross dedup + bloom pre-filter --------------------------------

  test("exact cross dedup: bloom-prefiltered plan returns exactly the plain anti-join") {
    // null-text rows on BOTH sides: SQL equality never matches nulls, so
    // the null new doc must be KEPT (the hash-of-null sentinel must not
    // conflate them — ref nulls are excluded before keying)
    val ref = ((0L until 300L).map(i => (i, s"ref doc number $i with body")) :+
      (900L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val newD = ((1000L until 1400L).map { i =>
      val t = if (i % 5 == 0) s"ref doc number ${i % 300} with body" // planted dup of ref
      else s"new doc $i fresh content"
      (i, t)
    } :+ (1900L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val plain = TrainingDataOps.exactCrossDedup(newD, ref).collect()
      .map(_.getLong(0)).sorted
    val bloomed = TrainingDataOps.exactCrossDedup(newD, ref, bloomItems = 300L, fpp = 0.05)
      .collect().map(_.getLong(0)).sorted
    assert(plain.toSeq == bloomed.toSeq, "bloom prefilter never changes the result")
    assert(plain.length == 321, s"80 planted dups dropped, null kept (got ${plain.length})")
    assert(!plain.contains(1000L) && plain.contains(1001L), "dup dropped, fresh kept")
    assert(plain.contains(1900L), "null-text new doc is never dropped")
  }

  // --- sketch-quality audits ---------------------------------------------

  test("minhash jaccard estimate: exact dup pair estimates 1.0; estimates are eighths") {
    val out = TrainingDataOps.minhashJaccardEstimate(base).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.contains((0L, 6L)), "exact dup pair is an LSH candidate")
    assert(out((0L, 6L)) == ((1.0, 1.0, 0.0)), s"dup pair: ${out((0L, 6L))}")
    out.values.foreach { case (est, exact, err) =>
      assert((est * 8).isWhole && est >= 0.0 && est <= 1.0, s"estimate is k/8: $est")
      assert(math.abs(err - math.abs(est - exact)) < 1e-5, "err column consistent")
    }
    out.get((0L, 1L)).foreach { case (est, exact, _) =>
      assert(est >= 0.5 && exact > 0.7, "near-dup pair estimates high")
    }
  }

  test("minhash jaccard estimate: cached handles release every persisted intermediate") {
    // start from a clean cache: a plan-identical persist from another
    // test would be REUSED by the CacheManager and shared entries would
    // confound the release accounting below
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val (res, handles) = TrainingDataOps.minhashJaccardEstimateCached(base)
    res.collect()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "the audit persists its intermediates while live")
    assert(handles.size == 3, "sigs + est + shingles handles")
    handles.foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "unpersisting the returned handles releases every cache entry")
  }

  test("gram cardinality: exact/occupied/estimate match a driver-side model; saturation reports -1") {
    val docs = base.withColumn("lang", lit("xx"))
      .select(col("lang"), col("text"))
    val m = 64
    val out = TrainingDataOps.gramCardinality(docs, n = 3, m = m).collect()
    assert(out.length == 1)
    val r = out(0)
    // driver-side ground truth over the same polynomial gram hashes
    val grams = base.collect().map(_.getString(1)).flatMap { text =>
      val hs = text.split(" ", -1).map(ph)
      (0 to hs.length - 3).map(i =>
        ((hs(i) * 31 + hs(i + 1)) % P * 31 + hs(i + 2)) % P)
    }
    val vExact = grams.distinct.length.toLong
    val vOcc = grams.map(_ % m).distinct.length.toLong
    assert(r.getLong(1) == grams.length.toLong, "n_grams")
    assert(r.getLong(2) == vExact, "v_exact")
    assert(r.getLong(3) == vOcc, "v_occ")
    val expEst =
      if (vOcc >= m) -1L
      else math.floor(-m.toDouble * math.log((m - vOcc).toDouble / m)).toLong
    assert(r.getLong(4) == expEst, s"estimate formula (got ${r.getLong(4)}, exp $expEst)")
    // a saturated bitmap must disclose, not extrapolate
    val sat = TrainingDataOps.gramCardinality(docs, n = 3, m = 1).collect()(0)
    assert(sat.getLong(4) == -1L, "v_occ = m reports -1")
  }

  test("winnowing + cdc: seeded random corpus matches the driver models incl. empty tokens") {
    // manual seeded generation (scalatestplus-scalacheck is not in the
    // offline cache — CLAUDE.md): random token counts 0..29 from a small
    // alphabet, with planted double/leading spaces so split()'s EMPTY
    // tokens (hash 0) flow through both operators
    val rnd = new scala.util.Random(1234)
    val words = Array("alpha", "bb", "see", "dd", "eef", "f", "gg", "hij")
    val fixtures = (0L until 60L).map { id =>
      val toks = Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length)))
      var text = toks.mkString(" ")
      if (rnd.nextInt(4) == 0 && text.nonEmpty) text = text.replaceFirst(" ", "  ")
      if (rnd.nextInt(5) == 0) text = " " + text
      (id, text)
    }
    val docs = fixtures.toDF("doc_id", "text")
    val w = TrainingDataOps.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    fixtures.foreach { case (id, text) =>
      assert(w(id) == winnowExpected(text), s"winnow mismatch on doc $id: '$text'")
    }
    val c = TrainingDataOps.cdcChunks(docs, divisor = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    fixtures.foreach { case (id, text) =>
      assert(c(id) == cdcExpected(text, 4), s"cdc mismatch on doc $id: '$text'")
    }
  }

  test("cms frequency audit: estimates never under-count and match a driver-side sketch") {
    val out = TrainingDataOps.cmsFrequencyAudit(
      base.select(col("text")), n = 3, w = 64, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10)
    // driver-side ground truth: same grams, same hash rows, w=64
    val grams = base.collect().map(_.getString(1)).flatMap { text =>
      val hs = text.split(" ", -1).map(ph)
      (0 to hs.length - 3).map(i =>
        ((hs(i) * 31 + hs(i + 1)) % P * 31 + hs(i + 2)) % P)
    }
    val cnt = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val counters = Array.fill(4)(new Array[Long](64))
    cnt.foreach { case (g, c) =>
      TrainingDataOps.CmsA.zip(TrainingDataOps.CmsB).zipWithIndex.foreach {
        case ((a, b), j) => counters(j)(((a * g + b) % P % 64).toInt) += c
      }
    }
    def est(g: Long): Long =
      TrainingDataOps.CmsA.zip(TrainingDataOps.CmsB).zipWithIndex.map {
        case ((a, b), j) => counters(j)(((a * g + b) % P % 64).toInt)
      }.min
    out.foreach { case (g, cExact, cEst, overErr) =>
      assert(cExact == cnt(g), s"exact count of gram $g")
      assert(cEst == est(g), s"CMS estimate of gram $g")
      assert(overErr == cEst - cExact && overErr >= 0,
        s"CMS never under-counts (gram $g: est $cEst exact $cExact)")
    }
    // the top-k MEMBERSHIP is the deterministic (count desc, gram asc)
    // prefix (row order after the final groupBy is not defined)
    val expTop = cnt.toSeq.sortBy { case (g, c) => (-c, g) }.take(10).map(_._1)
    assert(out.map(_._1).toSet == expTop.toSet, "top-k prefix deterministic")
  }

  // --- embedding outliers --------------------------------------------------

  test("embedding outliers: planted far vector ranks first; d2 matches an integer-exact model") {
    // 11 vectors per label tightly around a label axis, one planted far
    def vec(label: Int, i: Long, far: Boolean): Seq[Float] =
      Array.tabulate(8) { d =>
        val base = if (d == label) 0.5f else 0.05f
        val jig = ((i * 31 + d * 7) % 5).toFloat / 200f
        if (far) base + 0.4f + jig else base + jig
      }.toSeq
    val rows = for (l <- 0 until 2; i <- 0L until 11L)
      yield (l.toLong * 100 + i, l, vec(l, i, far = i == 7L))
    val df = rows.toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = TrainingDataOps.embeddingOutliers(df, k = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 4, "top-2 per 2 labels")
    out.filter(_._2 == 1L).foreach { case (l, _, vid, _) =>
      assert(vid == l * 100 + 7, s"planted far vector is rank 1 in label $l")
    }
    // integer-exact ground truth for one vector
    val q = rows.map { case (vid, l, e) =>
      (vid, l, e.map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
    }
    val g = q.filter(_._2 == 0)
    val n = g.length.toLong
    val sums = Array.tabulate(8)(d => g.map(_._3(d)).sum)
    val target = g.find(_._1 == 7L).get._3
    val d2exp = BigDecimal(
      target.indices.map { d =>
        val num = (target(d) * n - sums(d)).toDouble; num * num
      }.foldLeft(0.0)(_ + _) / (n.toDouble * n * 1e12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = out.find(r => r._1 == 0 && r._3 == 7L).get._4
    assert(got == d2exp, s"d2 integer-exact (got $got exp $d2exp)")
  }
}
