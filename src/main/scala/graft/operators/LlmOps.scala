package graft.operators

import graft.{Q, Tables}
import graft.functions.{CosineSimilarity, VectorKernels}
import graft.functions.MathFunctions.intDiv
import graft.functions.TextFunctions._
import graft.functions.TextKernels
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (the north-star extensions):
  * near-duplicate detection (MinHash-LSH, SimHash, exact n-gram Jaccard,
  * embedding cosine), similarity search (brute-force top-k + IVF), text
  * analysis (stats, tokens, quality, language-ID, fingerprints), and
  * multimodal binary plumbing.
  *
  * Scale posture: every candidate-generation step is a bucketed
  * equi-join (LSH band key, shared shingle, coarse cluster) — never an
  * unbounded cross product — so the shuffles stay bounded by bucket
  * size at 100 TB. Exact brute-force variants exist only where the
  * oracle needs them and are flagged as such.
  */
object LlmOps {
  import Tables._

  /** Rounds the last dedup_clusters run took to converge — observability
    * for the O(log diameter) hook+shortcut contract (the deep-chain spec
    * asserts a 54-diameter path closes in ≤ 8 rounds, not 54).
    */
  private[graft] val lastClusterRounds = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Recount jobs the last text_bpe_encode training loop ran —
    * observability for the batched-merge contract (the replay spec
    * asserts the 8 merge levels train in fewer than 8 recounts while
    * landing the sequential trainer's exact merge list).
    */
  private[graft] val lastBpeRecounts = new java.util.concurrent.atomic.AtomicInteger(-1)

  // 5-word shingles: the synthetic corpus has a ~50-word vocabulary, so
  // 3-shingles collide across unrelated docs; K=5 keeps the shingle
  // space sparse enough that rare-shingle blocking actually blocks.
  // private[graft]: the streaming near-dup filter shares these knobs
  private[graft] val ShingleK = 5
  private[graft] val MinhashPerms = 64
  private[graft] val Bands = 8
  private[graft] val RowsPerBand = 8
  private val JaccardThreshold = 0.8
  private val CosineDupThreshold = 0.45 // corpus max pairwise cosine ≈ 0.51
  // dedup_embedding block-pair fan-out: B(B+1)/2 tasks, each holding two
  // blocks of ~n/B vectors. Constant here; at 100 TB size B so a block
  // fits an executor (the quadratic work is inherent to exact all-pairs).
  private val EmbedBlocks = 8
  // sim_ann_ivf: constant-size centroid set + probe width, independent of
  // n — keeps the centroid broadcast O(k) and assignment O(n·k). The
  // probe width is tuned for the synthetic corpus, whose embeddings are
  // near-uniform on the sphere (max pairwise cosine ≈ 0.51): with no
  // cluster structure, recall scales with the probed fraction, so a wide
  // probe (13/16) is needed for recall ≥ 0.8 here. On naturally
  // clustered data the usual 2-4 probes suffice — both knobs stay
  // constants independent of table size, which is the 100 TB property.
  private val IvfCentroids = 16
  private val IvfProbes = 13
  // sim_ann_lsh: signed-random-projection code width and multi-probe
  // radius. Like the IVF knobs these are CONSTANTS independent of n —
  // on this near-uniform synthetic corpus recall tracks the probed
  // fraction (P(bit agrees) ≈ 2/3 at cosine ≈ 0.5), so a short code
  // with Hamming-2 multi-probe is needed for recall ≥ 0.8; naturally
  // clustered embeddings support longer codes and narrower probes.
  private val LshBits = 4
  private val LshProbe = 2

  /** PQ geometry: m subspaces × sd dims, k codes per subspace, and the
    * ADC survivor count handed to the exact re-rank (sim_ann_ivfpq).
    * Like the IVF/LSH probe knobs above, these ship wide for the
    * near-uniform driver corpus (where quantized ranking carries little
    * signal — see the clustered-fixture spec for the property that
    * matters on structured data at scale).
    */
  private val PqM = 4
  private val PqSub = 16
  private val PqK = 16
  private val PqRerank = 50

  /** Per-round lineage cut for iterative ops (dedup_clusters' label
    * propagation): local checkpoint by default — fastest, but blocks
    * live on executors, so executor loss on a real cluster kills the
    * iteration — with a RELIABLE opt-in: when `-Dgraft.checkpoint.dir`
    * (or env `GRAFT_CHECKPOINT_DIR`) names a cluster-visible directory,
    * rounds checkpoint there through `sc.setCheckpointDir` +
    * `Dataset.checkpoint()` (eager, reliable storage), trading one
    * distributed-FS write per round for executor-loss survival. Same
    * data either way — only the storage of the cut differs (spec:
    * LlmOpsSpec "dedup_clusters: reliable checkpoint path").
    */
  /** The configured-dir value [[roundCheckpoint]] last passed to
    * `setCheckpointDir`. The context's own `getCheckpointDir` cannot
    * serve as the guard: it returns the FULLY QUALIFIED path of a
    * fresh UUID subdir (`file:/dir/<uuid>`), which never startsWith
    * the raw configured string — comparing against it re-set the dir
    * (one FS mkdirs + an abandoned UUID dir) every propagation round.
    */
  @volatile private var checkpointDirSet: Option[String] = None

  private def roundCheckpoint(df: DataFrame): DataFrame =
    sys.props.get("graft.checkpoint.dir")
      .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR")) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // idempotent: only (re)set when unset or pointed elsewhere
        if (!checkpointDirSet.contains(dir) || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          checkpointDirSet = Some(dir)
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  /** 8-channel feature vector + frame count for one binary media
    * payload. Image payloads (sniffed by magic bytes, decoded with the
    * JDK's javax.imageio — PNG/JPEG/GIF/BMP readers ship in every JRE,
    * zero extra deps) yield real pixel statistics:
    * channels 0-2 = mean R,G,B in [0,1]; 3-5 = population std of
    * R,G,B in [0,1]; 6 = width; 7 = height; n_frames = 1 (a still
    * image is its own single frame). Undecodable payloads (no magic
    * match, or a corrupt container ImageIO rejects) get deterministic
    * byte-histogram features — 8 coarse 32-wide bins, normalized — and
    * the raw-buffer frame count; a fallback, not a decode, and
    * documented as such. Accumulation is exact integer sums → one
    * double division per channel, so results are bit-reproducible on
    * any partitioning.
    */
  private[graft] def imageFeatures(bytes: Array[Byte]): (Array[Float], Int) = {
    def isImageMagic: Boolean =
      bytes.length >= 4 && (
        (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
        (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) || // JPEG
        (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') ||
        (bytes(0) == 'B' && bytes(1) == 'M'))
    val img =
      if (!isImageMagic) null
      else
        // NonFatal, not just IOException: the JDK readers throw
        // IllegalArgumentException / ArrayIndexOutOfBounds /
        // NegativeArraySize / CMMException on magic-matching-but-
        // malformed payloads — the fallback contract must hold for
        // those too, not fail the whole Spark job
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
    if (img != null) {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var qr = 0L; var qg = 0L; var qb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      def mean(s: Long) = s.toDouble / n / 255.0
      def std(s: Long, q: Long) = {
        val m = s.toDouble / n
        math.sqrt(math.max(0.0, q.toDouble / n - m * m)) / 255.0
      }
      (Array(
        mean(sr).toFloat, mean(sg).toFloat, mean(sb).toFloat,
        std(sr, qr).toFloat, std(sg, qg).toFloat, std(sb, qb).toFloat,
        w.toFloat, h.toFloat), 1)
    } else {
      val feats = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        feats((bytes(i) & 0xFF) / 32) += 1.0f
        i += 1
      }
      val n = math.max(1, bytes.length)
      var j = 0
      while (j < 8) { feats(j) = feats(j) / n; j += 1 }
      (feats, (bytes.length / 64) + 1)
    }
  }

  /** The multimodal_features transform on an arbitrary (doc_id, blob)
    * dataset — separated from the registered query (which feeds it the
    * corpus' text bytes) so the decode path can be driven with real
    * image payloads (LlmOpsSpec generates PNGs in-fixture).
    */
  private[graft] def multimodalFeaturesOn(
      blobs: org.apache.spark.sql.Dataset[(Long, Array[Byte])]): DataFrame = {
    val sp = blobs.sparkSession
    import sp.implicits._
    blobs
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (feats, nFrames) = imageFeatures(bytes)
          (id, feats.toSeq, nFrames)
        }
      }
      .toDF("doc_id", "features", "n_frames")
      .select(
        col("doc_id"),
        posexplode(col("features")).as(Seq("channel", "value")),
        col("n_frames")
      )
      .select(
        col("doc_id"),
        col("channel").cast("long").as("channel"),
        round(col("value").cast("double"), 6).as("value"),
        col("n_frames").cast("long").as("n_frames")
      )
      .orderBy("doc_id", "channel")
  }

  /** Corpus embedding width, the single source of truth for ops that
    * need the dimension at plan-build time (embed_pca's Gram buffer).
    * Defined as PqM×PqSub so the PQ tiling and the dense-kernel width
    * can never drift apart — a geometry change updates both or fails
    * GramAggregator's runtime length require() in one obvious place.
    */
  private val EmbedDim = PqM * PqSub

  /** Rademacher ±1 hyperplane signs for [[lshCode]], derived
    * deterministically from XXH64 so any worker regenerates the same
    * hyperplanes — but generated ONCE per JVM per (bits, dims) instead
    * of O(bits·dims) hash calls per row (the coding stage's former CPU
    * hot spot). Keyed by dims because embedding width is data-dependent.
    */
  private val lshSignCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private[operators] def lshSigns(bits: Int, dims: Int): Array[Array[Double]] =
    lshSignCache.computeIfAbsent(
      (bits, dims),
      { key =>
        import org.apache.spark.sql.catalyst.expressions.XXH64
        Array.tabulate(key._1, key._2)((i, j) =>
          if ((XXH64.hashLong(i.toLong * 65536 + j, 42L) & 1L) == 0L) -1.0 else 1.0)
      }
    )

  /** Signed-random-projection LSH code: bit i is the sign of the dot
    * product with the precomputed [[lshSigns]] hyperplane — no stored
    * projection matrix shipped with the closure, identical codes to the
    * per-row hash derivation (spec-pinned).
    */
  private[graft] def lshCode(v: Array[Float], bits: Int): Int = {
    val signs = lshSigns(bits, v.length)
    var code = 0
    var i = 0
    while (i < bits) {
      val row = signs(i)
      var sum = 0.0
      var j = 0
      while (j < v.length) {
        sum += row(j) * v(j)
        j += 1
      }
      if (sum >= 0) code |= (1 << i)
      i += 1
    }
    code
  }

  /** All codes within `maxHamming` bit flips of `code` — the constant
    * multi-probe set. */
  private[operators] def probeCodes(code: Int, bits: Int, maxHamming: Int): Seq[Int] =
    (0 until (1 << bits)).filter(c => Integer.bitCount(c ^ code) <= maxHamming)

  /** IVF candidate set for the query vector (vec_id 0): every corpus
    * vector whose nearest sampled centroid is one of the `probes`
    * centroids closest to the query, with `emb`/`probe` columns ready
    * for the exact re-rank. Parameterized (and package-visible) so the
    * candidate-reduction spec can run it with narrow probes on a
    * clustered fixture and count candidates — the evidence that the
    * bucketing actually PRUNES, which the near-uniform driver corpus
    * cannot show (see the [[IvfProbes]] comment).
    */
  private[graft] def ivfCandidates(
      s: SparkSession, e0: DataFrame, centroids: Int, probes: Int): DataFrame = {
    val e = e0.withColumn("emb", toDouble(col("embedding")))
    // cents (k rows) and probe (one row) are each referenced by two
    // downstream consumers; uncached, every reference re-derives its
    // corpus-sized scan (hash-ranked sample / probe filter). Caching
    // the constant-size frames computes each once per invocation —
    // intra-query reuse, never cross-run state.
    val cents = e
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(centroids)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      .cache()
    val probe = e.filter(col("vec_id") === 0).select(col("emb").as("probe")).cache()
    CacheTracker.track("ivfCandidates", cents, probe)
    // shuffle-free assignment (r18, the embed_pq_encode pattern): the
    // k-row centroid table packs into ONE broadcast row and the argmax
    // folds inside the row via the codegen'd CosArgmaxCid kernel —
    // same per-pair cosine accumulation and the same (csim, cid)
    // struct-max tie-break as the crossJoin + groupBy(vec_id) it
    // replaces, whose struct-typed buffer forced SortAggregate (k-fold
    // row explosion, two corpus sorts, a corpus-wide exchange) and
    // whose join-back re-keyed the corpus a second time.
    val packed = cents.agg(sort_array(collect_list(struct(col("cid"), col("cemb")))).as("cbs"))
    val probeClusters = cents
      .crossJoin(broadcast(probe))
      .orderBy(CosineSimilarity.cosineSim(col("cemb"), col("probe")).desc, col("cid"))
      .limit(probes)
      .select(col("cid").as("cluster"))
    e.crossJoin(broadcast(packed))
      .withColumn("cluster", VectorKernels.cosArgmaxCid(col("emb"), col("cbs")))
      .drop("cbs")
      .join(broadcast(probeClusters), "cluster")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
  }

  /** IVF ANN top-10: exact cosine re-rank over [[ivfCandidates]]. */
  private[graft] def annIvf(
      s: SparkSession, e0: DataFrame, centroids: Int, probes: Int): DataFrame =
    ivfCandidates(s, e0, centroids, probes)
      .select(
        col("vec_id"), col("cluster"),
        round(CosineSimilarity.cosineSim(col("emb"), col("probe")), 6).as("score")
      )
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): assign every embedding to its nearest
    * hash-sampled centroid (constant-k broadcast, same sampling as
    * [[ivfCandidates]]), then detect near-duplicates ONLY within a
    * cluster cell — the candidate join is a bucketed equi-join on the
    * cell id, never all-pairs, which is the published scale path where
    * exact dedup_embedding's quadratic compare stops being affordable.
    * Greedy min-id survivor per ε-ball: a vector is dropped iff some
    * same-cell vector with a smaller id is within the cosine threshold;
    * each dropped vector reports its smallest such keeper. Approximate
    * by design (cross-cell near-dups are missed) ⇒ no SQL oracle; the
    * spec replays the exact same decision rule in-test from the raw
    * vectors and requires full equality. Package-visible for that spec.
    */
  private[graft] def semDedup(
      s: SparkSession, e0: DataFrame, centroids: Int, thr: Double): DataFrame = {
    val e = e0.withColumn("emb", toDouble(col("embedding")))
    val cents = e
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(centroids)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    // persist: the tagged table feeds both sides of the cell self-join.
    // The cache is registered in the session CacheManager for the
    // lifetime of the returned (lazy) plan — it cannot be unpersisted
    // here. Verify/Bench clearCache between queries; a long-lived
    // session embedding this op should spark.catalog.clearCache() (or
    // df.unpersist the consumed plan) once the result is materialized.
    // shuffle-free assignment (r18, the embed_pq_encode pattern — see
    // ivfCandidates): cell = CosArgmaxCid over the packed centroid
    // row, replacing crossJoin + SortAggregate + a corpus exchange +
    // the join-back with a narrow projection
    val packed = cents.agg(sort_array(collect_list(struct(col("cid"), col("cemb")))).as("cbs"))
    val tagged = e
      .crossJoin(broadcast(packed))
      .select(
        VectorKernels.cosArgmaxCid(col("emb"), col("cbs")).as("cell"),
        col("vec_id"), col("emb"))
      .persist()
    // sequence the shared cache build BEFORE AQE plans the self-join:
    // un-materialized, the join's two sides race to cache the same
    // partitions (duplicated kernel work, "Block already exists"
    // warnings) and AQE's stage-boundary re-optimization reads the
    // stats mid-materialization, so the broadcast build side — and the
    // AQE-final plan skeleton with it — became a timing race (r18
    // receipt: two cold runs, two different skeletons; in the
    // pre-CosArgmaxCid shape the flip even decided whether the final
    // groupBy(drop_id) paid an extra corpus exchange). One count()
    // over the cell-tagged table pins accurate equal stats on both
    // sides, so every sample runs the same plan. Computed from parquet
    // inside the timed region on every invocation. The drop-candidate
    // side y sits on the LEFT: with equal stats the planner's
    // tie-break builds RIGHT and streams left, keeping the dropped-row
    // stream (whose vec_id keys the final aggregate) out of the hash
    // table.
    CacheTracker.track("semDedup", tagged)
    tagged.count()
    tagged
      .as("y")
      .join(
        tagged.as("x"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id")
      )
      .withColumn("cos", CosineSimilarity.cosineSim(col("x.emb"), col("y.emb")))
      .filter(col("cos") >= thr)
      .groupBy(col("y.vec_id").as("drop_id"))
      .agg(
        max(col("x.cell")).as("cell"), // constant within the group
        min(struct(col("x.vec_id").as("keep_id"), col("cos").as("cos"))).as("k")
      )
      .select(
        col("drop_id"), col("cell"),
        col("k.keep_id").as("keep_id"), round(col("k.cos"), 6).as("cos")
      )
      .orderBy("drop_id")
  }

  /** IVF candidates for a query SET (every vec_id % 100 == 0): corpus
    * vectors bucket-joined to the probed clusters of EACH query. Probe
    * selection per query is the same bounded min-k aggregate the text
    * prefix path uses (no ranking window); the query and probe tables
    * are tiny and broadcast. Package-visible for the candidate-counting
    * spec, like [[ivfCandidates]].
    */
  private[graft] def ivfBatchCandidates(
      s: SparkSession, e0: DataFrame, centroids: Int, probes: Int): DataFrame = {
    val e = e0.withColumn("emb", toDouble(col("embedding")))
    // cents feeds both the packed assignment row and the per-query
    // probe selection — cache the k-row frame (the ivfCandidates
    // discipline) instead of re-deriving its corpus-sized sample scan
    val cents = e
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(centroids)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      .cache()
    CacheTracker.track("ivfBatchCandidates", cents)
    val corpus = e.filter(col("vec_id") % 100 =!= 0)
    // shuffle-free assignment via CosArgmaxCid (see ivfCandidates) —
    // the corpus is tagged in a narrow projection, no SortAggregate,
    // no corpus exchange, no join-back
    val packed = cents.agg(sort_array(collect_list(struct(col("cid"), col("cemb")))).as("cbs"))
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qv"))
    val probeC = queries
      .crossJoin(broadcast(cents))
      .select(
        col("q_id"),
        struct(
          (-CosineSimilarity.cosineSim(col("qv"), col("cemb"))).as("negsim"),
          col("cid")
        ).as("p")
      )
      .groupBy("q_id")
      .agg(slice(array_sort(collect_list(col("p"))), 1, probes).as("ps"))
      .select(col("q_id"), explode(col("ps")).as("p"))
      .select(col("q_id"), col("p.cid").as("cluster"))
    corpus
      .crossJoin(broadcast(packed))
      .withColumn("cluster", VectorKernels.cosArgmaxCid(col("emb"), col("cbs")))
      .drop("cbs")
      .join(broadcast(probeC), "cluster")
      .join(broadcast(queries), "q_id")
  }

  /** Batched IVF ANN: top-k per query over [[ivfBatchCandidates]] via
    * the bounded-heap [[graft.functions.TopKAggregator]] — the full
    * realistic shape at 100 TB: constant centroid broadcast, bucketed
    * candidate equi-join, map-side partial top-k (never a global
    * ranking window over n×q).
    */
  private[graft] def annIvfBatch(
      s: SparkSession, e0: DataFrame, centroids: Int, probes: Int, k: Int): DataFrame = {
    val sp = s
    import sp.implicits._
    import graft.functions.{Scored, TopKAggregator}
    ivfBatchCandidates(s, e0, centroids, probes)
      .select(
        col("q_id").as("qId"),
        CosineSimilarity.cosineSim(col("emb"), col("qv")).as("score"),
        col("vec_id").as("vecId")
      )
      .as[Scored]
      .groupByKey(_.qId)
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), posexplode(col("top.items")).as(Seq("pos0", "c")))
      .select(
        col("q_id"),
        (col("pos0") + 1).cast("long").as("rank"),
        col("c.vecId").as("vec_id"),
        round(col("c.score"), 6).as("score")
      )
      .orderBy("q_id", "rank")
  }

  /** IVF-PQ ANN top-10 for the query vector (vec_id 0) — the index
    * shape that scales past IVF-Flat: candidates come from the probed
    * IVF clusters, but ranking inside the probe set uses
    * product-quantized approximate scores (asymmetric distance
    * computation), so scanning a probed cluster touches each vector's
    * m sub-codes only — at 100 TB that is the difference between
    * reading 4 small ints and 64 floats per candidate — and only the
    * top `rerank` ADC survivors are re-read exactly. Every model table
    * is a broadcast-sized constant (centroid sample, m·k codebook, m·k
    * query lookup table); the code scan is a bucketed equi-join and the
    * per-vector ADC sum is a (vec,sub)→(vec) two-phase aggregate — no
    * driver-side model state at all (the LUT stays a DataFrame).
    * Approximate ⇒ rows-only check; recall vs the exact
    * sim_cosine_topk is spec'd like the other ANN variants.
    */
  private[graft] def annIvfPq(
      s: SparkSession, e0: DataFrame, centroids: Int, probes: Int,
      m: Int, sd: Int, ksub: Int, rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = e0.withColumn("emb", toDouble(col("embedding")))
    val corpus = e.filter(col("vec_id") =!= 0)
    // IVF coarse layer — identical sampling/probing to ivfCandidates.
    // cents/probe/cb1 are constant-size model frames referenced by
    // several consumers each; uncached, every reference re-derived a
    // corpus-sized pipeline (the round-17 plan counted 13 parquet
    // scans). Cached = computed once per invocation, intra-query only.
    val cents = e
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(centroids)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      .cache()
    // shuffle-free coarse assignment via CosArgmaxCid (see
    // ivfCandidates): narrow projection instead of crossJoin +
    // SortAggregate + corpus exchange
    val packedIvf =
      cents.agg(sort_array(collect_list(struct(col("cid"), col("cemb")))).as("cbs"))
    val assigned = corpus
      .crossJoin(broadcast(packedIvf))
      .withColumn("cluster", VectorKernels.cosArgmaxCid(col("emb"), col("cbs")))
      .select(col("vec_id"), col("cluster"))
    val probe = e.filter(col("vec_id") === 0).select(col("emb").as("probe")).cache()
    val probeClusters = cents
      .crossJoin(broadcast(probe))
      .orderBy(CosineSimilarity.cosineSim(col("cemb"), col("probe")).desc, col("cid"))
      .limit(probes)
      .select(col("cid").as("cluster"))
    // PQ codebook: ksub hash-ranked seeds, one Lloyd update, all m
    // subspaces in one dataflow (the embed_pq_encode shape, double
    // domain — this op is approximate, no cross-engine grid needed)
    def subvec(v: Column, sub: Column): Column =
      slice(v, (sub * sd + 1).cast("int"), lit(sd))
    def withSubs(df: DataFrame, idCols: Column*): DataFrame =
      df.select(idCols :+ explode(sequence(lit(0L), lit((m - 1).toLong))).as("sub"): _*)
    val seeds = corpus
      .select(col("vec_id"), col("emb"), md5(col("vec_id").cast("string")).as("h"))
      .orderBy("h", "vec_id")
      .limit(ksub)
      .withColumn("cell", row_number().over(Window.orderBy("h", "vec_id")).cast("long"))
    // the ksub-row seed window runs on post-limit rows only
    val i0 = withSubs(seeds, col("cell"), col("emb"))
      .select(col("sub"), col("cell"), subvec(col("emb"), col("sub")).as("c"))
    val sv = withSubs(corpus, col("vec_id"), col("emb"))
      .select(col("vec_id"), col("sub"), subvec(col("emb"), col("sub")).as("sq"))
    // assignment with ZERO shuffle: the k-entry codebook of each
    // subspace packs into ONE broadcast row (cell-sorted list) and the
    // argmin folds over it inside the row — a (vec,sub) row is never
    // exploded k ways nor re-grouped, so nothing corpus-sized ever
    // carries more than its own subvector (the naive join+groupBy shape
    // shuffles k copies of every subvector — a multi-GB exchange at
    // 100x that this fold eliminates; measured in PLANS.md)
    def assignPq(cb: DataFrame): DataFrame = {
      val packed = cb.groupBy("sub")
        .agg(sort_array(collect_list(struct(col("cell"), col("c")))).as("cbs"))
      sv.join(broadcast(packed), "sub")
        // native codegen'd argmin over the cell-sorted packed codebook
        // (same tie-break as ORDER BY d2, cell)
        .withColumn("best", VectorKernels.pqArgmin(col("sq"), col("cbs")))
        .select(col("vec_id"), col("sub"), col("best.cell").as("cell"), col("sq"))
    }
    val cb1 = assignPq(i0)
      .select(col("sub"), col("cell"), posexplode(col("sq")).as(Seq("dim", "v")))
      .groupBy("sub", "cell", "dim")
      .agg(avg(col("v")).as("avg"))
      .groupBy("sub", "cell")
      .agg(
        transform(
          sort_array(collect_list(struct(col("dim"), col("avg")))),
          x => x.getField("avg")
        ).as("c")
      )
      // m·k = 16 rows, referenced by the encode pass AND the query LUT
      .cache()
    CacheTracker.track("annIvfPq", cents, probe, cb1)
    val codes = assignPq(cb1).select(col("vec_id"), col("sub"), col("cell"))
    // query lookup table: per (sub, cell) the query-subvector dot and
    // the codebook entry's squared norm — m·k rows, broadcast
    val lut = cb1
      .crossJoin(broadcast(probe))
      .select(
        col("sub"), col("cell"),
        VectorKernels.dot(col("c"), subvec(col("probe"), col("sub"))).as("qdot"),
        VectorKernels.dot(col("c"), col("c")).as("cnorm2")
      )
    val qnorm = probe
      .select(sqrt(aggregate(col("probe"), lit(0.0), (acc, x) => acc + x * x)).as("qnorm"))
    // ADC over the probed candidates: only (vec, sub, code) rows travel
    val adc = codes
      .join(assigned, "vec_id")
      .join(broadcast(probeClusters), "cluster")
      .join(broadcast(lut), Seq("sub", "cell"))
      .groupBy("vec_id")
      .agg(sum(col("qdot")).as("adot"), sum(col("cnorm2")).as("anorm2"))
      .crossJoin(broadcast(qnorm))
      .select(
        col("vec_id"),
        // zero-norm pin (FuzzSemanticsSpec): a zero probe or an
        // all-zero codebook reconstruction makes the ADC denominator 0
        // — ANSI would raise DIVIDE_BY_ZERO; score 0.0 like the exact
        // cosine kernel does for a zero-norm side
        when(col("qnorm") * sqrt(col("anorm2")) > 0.0,
          col("adot") / (col("qnorm") * sqrt(col("anorm2"))))
          .otherwise(lit(0.0)).as("ascore"))
      .orderBy(col("ascore").desc, col("vec_id"))
      .limit(rerank)
    // exact cosine re-rank of the bounded ADC survivor set
    corpus
      .join(broadcast(adc), "vec_id")
      .crossJoin(broadcast(probe))
      .select(
        col("vec_id"),
        round(col("ascore"), 6).as("ascore"),
        round(CosineSimilarity.cosineSim(col("emb"), col("probe")), 6).as("score")
      )
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  /** LSH candidate set for the query vector (vec_id 0): corpus vectors
    * whose `bits`-wide signed-random-projection code is within
    * `maxHamming` of the query's, with the query vector joined in for
    * the exact re-rank. Package-visible for the candidate-reduction
    * spec (see [[ivfCandidates]]).
    */
  private[graft] def lshCandidates(
      s: SparkSession, e0: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val sp = s
    import sp.implicits._
    val coded = e0
      .filter(col("embedding").isNotNull) // unindexable: no code, no rank
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, lshCode(v, bits)) }
      .toDF("vec_id", "embedding", "code")
    val qCodes = coded
      .filter(col("vec_id") === 0)
      .select(col("code"), toDouble(col("embedding")).as("qv"))
      .as[(Int, Array[Double])]
      .flatMap { case (qc, qv) => probeCodes(qc, bits, maxHamming).map(pc => (pc, qv)) }
      .toDF("code", "qv")
    coded
      .filter(col("vec_id") =!= 0)
      .join(broadcast(qCodes), "code")
  }

  /** LSH ANN top-10: exact cosine re-rank over [[lshCandidates]]. */
  private[graft] def annLsh(
      s: SparkSession, e0: DataFrame, bits: Int, maxHamming: Int): DataFrame =
    lshCandidates(s, e0, bits, maxHamming)
      .select(
        col("vec_id"), col("code"),
        round(CosineSimilarity.cosineSim(toDouble(col("embedding")), col("qv")), 6).as("score")
      )
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)

  /** Distinct word-K-shingles as exploded rows (doc_id, shingle, sz)
    * where sz = |distinct shingle set| of the doc.
    *
    * One narrow kernel stage ([[TextKernels.distinctShingles]] inside a
    * typed flatMap) — replaces the former posexplode → K-1 lead-windows
    * → dropDuplicates → count-window plan, whose three shuffles and
    * janino-compiled window stages dominated at bench scale. Emits the
    * exact same (doc_id, shingle, sz) rows (same tokenizer semantics,
    * asserted by TextKernelsSpec). The documents table is one small
    * parquet file (a single input partition), so the repartition
    * spreads the kernel work.
    */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    shingleRowsOf(s, documents(s, d))

  /** Same, over an arbitrary (doc_id, text) frame — callers that only
    * need a subset filter BEFORE this call so the predicate prunes at
    * the parquet scan instead of dying above the opaque kernel stage.
    */
  private def shingleRowsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    val sp = s
    import sp.implicits._
    docs
      .filter(col("text").isNotNull) // null text: no shingles (both engines)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = TextKernels.distinctShingles(text, ShingleK)
        val sz = sh.length.toLong
        sh.iterator.map(x => (id, x, sz))
      }
      .toDF("doc_id", "shingle", "sz")
  }

  /** (doc_id, shs): per-doc sorted shingle-hash set, computed in ONE
    * narrow kernel stage ([[TextKernels.shingleHashes]]) — the verify
    * payload for the candidate pair joins AND the root of the hashed
    * inverted index. One compact row per doc (vs the exploded string
    * index it replaces), so persisting it is cheap and [[pairStats]]
    * needs no re-aggregation. The kernel hash equals SQL `xxhash64`
    * bit-for-bit (TextKernelsSpec), and every downstream step needs
    * only hash equality/order, so results match the former
    * string-keyed plan up to 64-bit collisions (~|shingles|²/2⁶⁵ —
    * never observed; the exact merge-kernel verify already ran on
    * these hashes before this change).
    */
  private def shinglePayloadOf(s: SparkSession, docs: DataFrame): DataFrame = {
    val sp = s
    import sp.implicits._
    docs
      // null text shingles to nothing — the same row the oracle side
      // drops (len(string_split(NULL, ' ')) >= K is NULL → filtered);
      // a pushed scan filter, not a per-row kernel branch
      // (NULL-robustness campaign, round 13)
      .filter(col("text").isNotNull)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val shs = TextKernels.shingleHashes(text, ShingleK)
        if (shs.isEmpty) Iterator.empty else Iterator.single((id, shs))
      }
      .toDF("doc_id", "shs")
  }

  /** Exploded hashed inverted index (doc_id, sz, h) derived from the
    * payload — 8-byte join keys through every downstream shuffle
    * instead of ~25-byte shingle strings.
    */
  private def hashedInv(payload: DataFrame): DataFrame =
    payload.select(col("doc_id"), size(col("shs")).as("sz"), explode(col("shs")).as("h"))

  /** (doc_id, h) restricted to each doc's `sz − ⌈τ·sz⌉ + 1`
    * globally-rarest shingle hashes — the PPJoin-style prefix under the
    * (df, h) total order. Complete as a probe set for both Jaccard ≥ τ
    * (prefix ⋈ prefix) and containment ≥ τ (prefix ⋈ full index): a
    * qualifying pair must share a prefix element under ANY fixed total
    * order of the shingle universe, and rarity keeps the candidate join
    * bounded.
    *
    * Shuffle shape (the round-5 hot spot, retightened round 18):
    * document frequencies reach the selection through the df ≥ 2 table
    * only — most shingles are globally unique, so that table is a
    * small fraction of the distinct-shingle set and AQE turns its
    * joins into broadcasts at bench scale, degrading to plain shuffled
    * equi-joins at extreme scale. The former shape then collected and
    * sorted EVERY (df, h) struct per doc (an ObjectHashAggregate over
    * the full index, behind a corpus-sized (doc_id, sz) exchange — the
    * cached payload sits under an AdaptiveSparkPlan, whose partitioning
    * downstream consumers cannot reuse). But df=1 shingles sort before
    * all repeated ones and, among themselves, exactly in the order of
    * the doc's sorted `shs` array — so only the REPEATED occurrences
    * (index ⋈ df≥2, inner) need aggregating per doc, and
    * [[TextKernels.prefixSelect]] merges them with `shs` into the
    * identical k-smallest-(df, h) prefix (spec: literal equality vs
    * the former plan). Shuffled bytes drop from the full 4-column
    * index to the repeated fraction; the full-index collect, its
    * exchange and the per-doc array_sort disappear.
    */
  private def rarePrefix(payload: DataFrame, tau: Double): DataFrame = {
    val s = payload.sparkSession
    import s.implicits._
    val inv = hashedInv(payload)
    val repeated = inv.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    val docRep = inv
      .join(repeated, Seq("h"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("h"), col("df"))).as("reps"))
    payload
      .join(docRep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("shs"), col("reps.h").as("rh"), col("reps.df").as("rdf"))
      .as[(Long, Array[Long], Array[Long], Array[Long])]
      .flatMap { case (id, shs, rh, rdf) =>
        TextKernels.prefixSelect(shs, rh, rdf, tau).iterator.map(h => (id, h))
      }
      .toDF("doc_id", "h")
  }

  /** Exact intersection stats for candidate pairs: join each pair to
    * the two sorted shingle-hash sets and merge-count in a per-pair
    * kernel, emitting (doc_a, doc_b, inter, sz_a, sz_b) — every
    * similarity score (Jaccard, containment, …) is a relational
    * expression on top, so the kernel stays single-sourced. Sizes and
    * intersections over 64-bit hashes equal those over the shingle
    * strings up to hash collisions (~|distinct shingles|²/2⁶⁵ — never
    * observed at any real corpus size).
    */
  private def pairStats(s: SparkSession, cand: DataFrame, payload: DataFrame): DataFrame = {
    val sp = s
    import sp.implicits._
    cand
      .join(payload.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(payload.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shs_a"), col("shs_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) =>
        (a, b, TextKernels.intersectCount(sa, sb).toLong, sa.length.toLong, sb.length.toLong)
      }
      .toDF("doc_a", "doc_b", "inter", "sz_a", "sz_b")
  }

  /** (doc_id, shs, sig, bkeys): per-doc sorted shingle-hash set,
    * 64-perm MinHash signature and LSH band keys, computed in ONE
    * narrow kernel stage via [[TextKernels]]. The kernel replicates the
    * SQL xxhash64 fold order exactly, so signatures and band keys are
    * bit-identical to the former explode + 64-min-aggregate plan
    * (asserted by TextKernelsSpec) — that plan's floor was janino
    * compilation of the 64-aggregate generated code, not data.
    */
  private def minhashSigs(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    documents(s, d)
      .filter(col("text").isNotNull) // null text: no shingles (both engines)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val shs = TextKernels.shingleHashes(text, ShingleK)
        // docs with no shingle (< K tokens) emit NO row — exactly like
        // the former aggregate plan; an all-MaxValue placeholder sig
        // would funnel every short doc into the same LSH buckets and
        // blow up the candidate join quadratically
        if (shs.isEmpty) Iterator.empty
        else {
          val sig = TextKernels.minhashSig(shs, MinhashPerms)
          Iterator.single((id, shs, sig, TextKernels.bandKeys(sig, Bands, RowsPerBand)))
        }
      }
      .toDF("doc_id", "shs", "sig", "bkeys")
  }

  /** Shared pipeline of dedup_minhash and dedup_minhash_pairs: banded
    * LSH candidates, exact-Jaccard verify, both the sketch estimate
    * (est_raw) and the exact jacc_raw kept so each query id projects
    * what it needs.
    *
    * `completeForTau = true` (dedup_minhash_pairs' oracle contract)
    * additionally unions the PPJoin rare-prefix candidates — COMPLETE
    * for Jaccard ≥ τ under any fixed shingle order — so the verified
    * pair set provably equals the exact all-pairs answer regardless of
    * banding luck: an 8×8 banding is probabilistically incomplete near
    * τ (per-pair recall ~0.77 at exactly 0.8), which is fine for
    * dedup_minhash's recall SPEC but would make an EXACT DuckDB oracle
    * flake on corpus regeneration. The minhash verify kernel still
    * scores every candidate, so the oracle exercises the same code.
    */
  private def minhashVerifiedPairs(
      s: SparkSession, d: String, completeForTau: Boolean = false): DataFrame = {
    val sp = s
    import sp.implicits._
    // persist: the signature table feeds the band-key explode plus
    // both sides of the verify payload join (and the prefix index under
    // completeForTau). The result is lazy, so the cache can't be
    // unpersisted inside this builder — instead residency is bounded to
    // ONE table per JVM: each invocation evicts the previous
    // invocation's signature cache (recompute-safe even if that plan
    // were somehow still running), so a long-lived session issuing
    // repeated minhash queries no longer accumulates cached tables.
    val sigs = minhashSigs(s, d).persist()
    CacheTracker.track("minhashVerifiedPairs", sigs)
    // distinct() after the band join is deliberate: a first-match-only
    // variant (carry the full bkeys array on both sides, keep a pair
    // only at its first matching band) was measured SLOWER at sf0.1
    // (0.84 vs 0.60 s) AND at the 10x clone stress (8.0 vs 4.7 s) —
    // the join still produces every duplicate match before the filter,
    // so it saves only the distinct exchange while paying Bands× wider
    // shuffle inputs + a 28-comparison predicate per joined row.
    // (PLANS.md "first-match-only candidate emission" for the
    // experiment; the simhash variant lost even harder at 100x.)
    val thr = JaccardThreshold
    val perms = MinhashPerms
    val bandsDf = sigs.select(col("doc_id"), explode(col("bkeys")).as("bkey"))
    val bandCand = bandsDf
      .as("x")
      .join(
        bandsDf.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id")
      )
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val cand =
      if (!completeForTau) bandCand.distinct()
      else {
        val prefix = rarePrefix(sigs.select(col("doc_id"), col("shs")), thr)
        val prefCand = prefix
          .as("x")
          .join(
            prefix.as("y"),
            col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        bandCand.unionByName(prefCand).distinct()
      }
    // exact-Jaccard verify as a per-pair merge kernel over the two
    // sorted shingle-hash sets (collision-free at 64 bits for any
    // real corpus) — replaces two relational intersection joins
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shs_a"), col("shs_b"), col("sig_a"), col("sig_b"))
      .as[(Long, Long, Array[Long], Array[Long], Array[Long], Array[Long])]
      .flatMap { case (a, b, sa, sb, ga, gb) =>
        val inter = TextKernels.intersectCount(sa, sb)
        val uni = sa.length + sb.length - inter
        val jacc = if (uni == 0) 0.0 else inter.toDouble / uni
        if (jacc >= thr)
          Iterator.single((a, b, TextKernels.sigAgreement(ga, gb).toDouble / perms, jacc))
        else Iterator.empty
      }
      .toDF("doc_a", "doc_b", "est_raw", "jacc_raw")
  }

  /** (doc_id, sig): 64-bit SimHash per doc — bit j set iff more than
    * half the xxhash64'd regex tokens have bit j set. One narrow kernel
    * stage ([[TextKernels.simhashSig]]); bit-identical to the former
    * explode + 64-bit-sum-aggregate plan (TextKernelsSpec).
    */
  private def simhashSigs(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    // persist: consumed twice by the chunk self-join
    val out = documents(s, d)
      .filter(col("text").isNotNull) // null text: no tokens (both engines)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // docs with zero regex tokens emit NO row (like the former
        // aggregate plan) — a shared sig=0 placeholder would pair every
        // such doc as a spurious hamming-0 near-duplicate
        val toks = TextKernels.reTokens(text)
        if (toks.isEmpty) Iterator.empty
        else Iterator.single((id, TextKernels.simhashSigOf(toks)))
      }
      .toDF("doc_id", "sig")
      .persist()
    CacheTracker.track("simhashSigs", out)
    out
  }

  /** Exact n-gram-Jaccard near-dup pairs (doc_a < doc_b, jacc_raw ≥ τ)
    * with PPJoin-style prefix filtering: index each doc only by its
    * (|sh| - ⌈τ·|sh|⌉ + 1) globally-rarest shingles. Complete for
    * Jaccard ≥ τ (two sets meeting the threshold must share a prefix
    * element), and the rare-shingle buckets keep candidate pairs
    * bounded — this is what survives a 100× scale-up, unlike a full
    * inverted index over frequent shingles.
    */
  private def ngramPairs(s: SparkSession, d: String): DataFrame = {
    // persist the compact per-doc payload (hash sets) — read by the
    // frequency agg, the prefix join and the pair verify — and the
    // prefix itself, which the candidate self-join reads twice (alias
    // exchanges don't dedupe across a self-join)
    val payload = shinglePayloadOf(s, documents(s, d)).persist()
    val prefix = rarePrefix(payload, JaccardThreshold).persist()
    CacheTracker.track("ngramPairs", payload, prefix)
    val cand = prefix
      .as("x")
      .join(prefix.as("y"), col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairStats(s, cand, payload)
      .withColumn("jacc_raw", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jacc_raw") >= JaccardThreshold)
      .select("doc_a", "doc_b", "jacc_raw")
  }

  /** Containment threshold for the asymmetric near-dup query. */
  private val ContainmentThreshold = 0.9

  /** PII patterns (text_pii) — RE2-compatible subset (character
    * classes, bounded repeats, \b, \d only; no backreferences or
    * lookaround) so Java regex (Spark) and RE2 (DuckDB) agree, and both
    * engines' single-quoted SQL literals pass backslashes through
    * verbatim.
    */
  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val IdNumRe = """\b\d{7,}\b"""

  val all: Seq[Q] = Seq(
    // ---- text analysis -------------------------------------------------
    Q(
      "text_stats",
      (s, d) =>
        documents(s, d)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(wsTokens(col("text")))).as("sum_tokens"),
            round(avg(size(wsTokens(col("text")))), 6).as("avg_tokens"),
            round(avg(length(col("text"))), 6).as("avg_chars")
          )
          .orderBy("lang"),
      Some(
        """SELECT lang, count(*) AS n_docs,
          |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
          |       round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
          |       round(avg(length(text)), 6) AS avg_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
      )
    ),
    Q(
      "text_tokens",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            size(wsTokens(col("text"))).cast("long").as("n_ws"),
            reTokenCount(col("text")).cast("long").as("n_re"),
            length(col("text")).cast("long").as("n_chars")
          )
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
          |       CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_re,
          |       CAST(length(text) AS BIGINT) AS n_chars
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ),
    Q(
      "text_quality",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"), qualityScore(col("text")).as("quality"))
          .orderBy("doc_id"),
      Some(
        // integer-scaled score (see TextFunctions.qualityScore): both
        // engines compute the identical BIGINT round-half-up(score·1e6),
        // then the identical double via /1e6 — no round-half boundary
        """WITH t AS (SELECT doc_id,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
          |  CAST(length(text) AS BIGINT) AS c,
          |  CAST(len(list_filter(string_split(text, ' '),
          |       w -> w IN ('the','a','of','and','to','in','is','that'))) AS BIGINT) AS s,
          |  CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS BIGINT) AS a
          |  FROM documents)
          |SELECT doc_id,
          |  CASE WHEN c = 0 THEN NULL ELSE
          |  ((CAST(40*s*c + 3*least((c-n+1)*c, 10*n*c) + 30*a*n AS HUGEINT) * 2000000 + 100*n*c)
          |    // (2*100*n*c)) END / 1000000.0 AS quality
          |FROM t ORDER BY doc_id""".stripMargin
      )
    ),
    // Document fingerprints: whole-doc md5 + min shingle-hash (1-perm
    // MinHash with a cryptographic hash both engines share).
    Q(
      "text_fingerprint",
      (s, d) => {
        val docs = documents(s, d)
        // min-shingle md5 via explode + codegen'd min-aggregate (the
        // per-array HOF transform is interpreted and ~10× slower)
        val minSh = shingleRows(s, d)
          .groupBy("doc_id")
          .agg(min(md5(col("shingle"))).as("fp_shingle"))
        docs
          .select(col("doc_id"), md5(col("text")).as("fp_doc"))
          .join(minSh, Seq("doc_id"), "left")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
           |SELECT doc_id, md5(text) AS fp_doc,
           |  list_aggregate(
           |    list_transform(
           |      list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |        i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))),
           |      s -> md5(s)), 'min') AS fp_shingle
           |FROM t ORDER BY doc_id""".stripMargin
      )
    ),
    // Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    // SIGMOD 2003 — the MOSS algorithm): hash every word-3-gram, slide a
    // w=4 window over the hash sequence, select the RIGHTMOST minimum of
    // each window, dedupe selections. Guarantees every match of length
    // >= w+k-1 tokens shares a fingerprint (the detection floor 0-mod-p
    // sampling lacks), with expected density 2/(w+1) — the partial-
    // overlap fingerprint the whole-doc min-shingle of text_fingerprint
    // cannot provide. Mechanics: ONE shuffle on doc_id serves both the
    // 3-gram lead()s and the O(w)-bounded frame collects (same window
    // spec ⇒ Catalyst reuses the sort); rightmost-min falls out of
    // codegen'd array ops (reverse + array_position), no HOF aggregate,
    // no self-join; the trailing distinct shuffles only selected
    // fingerprints (~2n/(w+1) rows). Per-row state is w entries —
    // constant — so the op is a linear single-pass at any corpus size.
    Q(
      "text_winnow",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wWin = 4 // winnowing window (in k-grams)
        val byPos = Window.partitionBy("doc_id").orderBy("pos")
        val frame = byPos.rowsBetween(0, wWin - 1)
        val gram = concat_ws(" ", col("tok"), col("t1"), col("t2"))
        documents(s, d)
          .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
          .withColumn("t1", lead("tok", 1).over(byPos))
          .withColumn("t2", lead("tok", 2).over(byPos))
          .filter(col("t2").isNotNull)
          .select(
            col("doc_id"),
            col("pos"),
            conv(substring(md5(gram), 1, 8), 16, 10).cast("long").as("h")
          )
          .withColumn("hs", collect_list("h").over(frame))
          .withColumn("ps", collect_list("pos").over(frame))
          .filter(size(col("hs")) === wWin)
          .withColumn("m", array_min(col("hs")))
          .select(
            col("doc_id"),
            element_at(
              col("ps"),
              (lit(wWin + 1) - array_position(reverse(col("hs")), col("m"))).cast("int")
            ).cast("long").as("fp_pos"),
            col("m").as("fp_hash")
          )
          .distinct()
          .orderBy("doc_id", "fp_pos")
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (SELECT doc_id,
          |        unnest(list_transform(range(1, len(toks) - 1), i -> i - 1)) AS pos,
          |        unnest(list_transform(range(1, len(toks) - 1),
          |          i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 8))
          |               AS BIGINT))) AS h
          |      FROM t WHERE len(toks) >= 3),
          |w AS (SELECT doc_id, list(h) OVER fr AS hs, list(pos) OVER fr AS ps
          |      FROM g
          |      WINDOW fr AS (PARTITION BY doc_id ORDER BY pos
          |                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
          |SELECT DISTINCT doc_id,
          |  ps[5 - list_position(list_reverse(hs), list_aggregate(hs, 'min'))] AS fp_pos,
          |  list_aggregate(hs, 'min') AS fp_hash
          |FROM w WHERE len(hs) = 4
          |ORDER BY doc_id, fp_pos""".stripMargin
      )
    ),
    // Repeated-substring span detection (the distributed form of
    // ExactSubstr dedup, Lee et al. 2022 "Deduplicating Training Data
    // Makes Language Models Better": cut text spans that appear
    // verbatim elsewhere in the corpus). The suffix-array algorithm of
    // the paper is sequential; the scale shape is k-gram marking — a
    // token-5-gram occurring >= 2 times anywhere marks its span, and
    // per-doc overlapping marks merge to maximal spans via
    // gaps-and-islands (running max(end) + cumulative island counter,
    // one user-keyed window). Two bounded shuffles: one on the gram
    // TEXT (exact — no hash-collision false marks) for the occurrence
    // count, one on doc_id for the span merge; on a real corpus only a
    // vanishing duplicated fraction survives the >= 2 filter into the
    // merge stage.
    Q(
      "dedup_substring",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sp = s
        import sp.implicits._
        val k = 5
        // positional grams in ONE narrow kernel pass
        // (TextKernels.posGrams — row-identical to the former
        // posexplode + 4 lead-windows + concat_ws pipeline, asserted by
        // TextKernelsSpec): the windowed leads forced a full-corpus
        // hash exchange + sort on (doc_id, pos) — per CONSUMER, so
        // twice (the occurrence-count branch and the join probe both
        // re-derive grams). The kernel needs no ordering, so the only
        // doc_id exchange left in the plan moves BELOW the dup-gram
        // join, where it carries the surviving hit rows (a vanishing
        // duplicated fraction on a real corpus), not every token of
        // the corpus. null text emits no grams on both engines (the
        // scan filter here; len(string_split(NULL)) IS NULL there).
        val grams = documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            TextKernels.posGrams(text, k).map { case (p, g) => (id, p, g) }
          }
          .toDF("doc_id", "pos", "gram")
        // corpus-wide occurrence count as a two-phase
        // groupBy(gram).count() + df>=2 join-back. A COUNT OVER
        // (PARTITION BY gram) window would be one shuffle cheaper at
        // small scale (measured 1.83 -> 1.46 s at sf0.1), but gram
        // frequency is Zipfian: a window serializes EVERY copy of the
        // hottest gram (license boilerplate, templated spans) into a
        // single task with no map-side combine — a straggler cliff at
        // corpus scale. The two-phase agg collapses hot grams
        // map-side (partial_count before the exchange), and the df>=2
        // survivor table is vocabulary-sized, so the join-back probe
        // is cheap (broadcast-degradation at 100x measured the join
        // within noise: 81.4 s vs 84.3 s with broadcast forced off).
        val dupGrams = grams
          .groupBy("gram")
          .agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select("gram")
        val hits = grams
          .join(dupGrams, "gram")
          .select(col("doc_id"), col("pos"), (col("pos") + k).as("e"))
        val prevMax = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)
        val runSum = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, 0)
        hits
          .withColumn("pmax", max(col("e")).over(prevMax))
          .withColumn(
            "island",
            sum(when(col("pmax").isNull || col("pos") > col("pmax"), 1).otherwise(0)).over(runSum)
          )
          .groupBy("doc_id", "island")
          .agg(
            min(col("pos")).cast("long").as("span_start"),
            max(col("e")).cast("long").as("span_end"),
            count(lit(1)).as("n_grams")
          )
          .select("doc_id", "span_start", "span_end", "n_grams")
          .orderBy("doc_id", "span_start")
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (SELECT doc_id,
          |        unnest(list_transform(range(1, len(toks) - 3), i -> i - 1)) AS pos,
          |        unnest(list_transform(range(1, len(toks) - 3),
          |          i -> array_to_string(toks[i:i+4], ' '))) AS gram
          |      FROM t WHERE len(toks) >= 5),
          |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
          |h AS (SELECT g.doc_id, g.pos, g.pos + 5 AS e FROM g JOIN d USING (gram)),
          |w AS (SELECT doc_id, pos, e,
          |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
          |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          |      FROM h),
          |i AS (SELECT doc_id, pos, e,
          |        sum(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END)
          |          OVER (PARTITION BY doc_id ORDER BY pos
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          |      FROM w)
          |SELECT doc_id,
          |  CAST(min(pos) AS BIGINT) AS span_start,
          |  CAST(max(e) AS BIGINT) AS span_end,
          |  CAST(count(*) AS BIGINT) AS n_grams
          |FROM i GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin
      )
    ),
    // Language-ID heuristic — stopword-profile argmax. Fully
    // SQL-expressible, so it IS oracle-checked: the oracle's CASE chain
    // (zh → fr → es → en → de) replicates Spark's
    // array_max(struct(score, lang)) tie-break exactly (max score, then
    // lexicographically max lang; note zh text tokenizes to nothing
    // under [a-z0-9] so all-zero scores tie-break to 'zh').
    Q(
      "text_langid",
      (s, d) =>
        documents(s, d)
          // no text, no prediction: SQL NULL on both sides (the oracle's
          // CASE chain would otherwise fall through its NULL comparisons
          // to the ELSE arm and "predict" the last language)
          .select(col("doc_id"),
            when(col("text").isNotNull, langId(col("text"))).as("lang_pred"),
            col("lang"))
          .orderBy("doc_id"),
      Some(
        """WITH t AS (SELECT doc_id, lang, text,
          |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), w -> w <> '') AS toks
          |  FROM documents),
          |s AS (SELECT doc_id, lang, text,
          |  len(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','that'))) AS s_en,
          |  len(list_filter(toks, w -> w IN ('der','die','das','und','ist','von','mit','ein'))) AS s_de,
          |  len(list_filter(toks, w -> w IN ('le','la','les','et','un','une','est','que'))) AS s_fr,
          |  len(list_filter(toks, w -> w IN ('el','los','las','y','un','una','es','en'))) AS s_es,
          |  len(list_filter(toks, w -> w IN ('的','是','了','在','我','有','和','不'))) AS s_zh
          |  FROM t)
          |SELECT doc_id,
          |  CASE WHEN text IS NULL THEN NULL
          |       WHEN s_zh >= greatest(s_en, s_de, s_fr, s_es) THEN 'zh'
          |       WHEN s_fr >= greatest(s_en, s_de, s_es) THEN 'fr'
          |       WHEN s_es >= greatest(s_en, s_de) THEN 'es'
          |       WHEN s_en >= s_de THEN 'en'
          |       ELSE 'de' END AS lang_pred,
          |  lang
          |FROM s ORDER BY doc_id""".stripMargin
      )
    ),
    // ---- dedup ---------------------------------------------------------
    // Exact dedup by content hash (hash-groupBy): one survivor per
    // distinct text, plus the duplicate count — the O(n) baseline every
    // near-dup method is layered on.
    Q(
      "dedup_exact",
      (s, d) =>
        documents(s, d)
          .groupBy(md5(col("text")).as("chk"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
          .select(col("keep_id"), col("chk"), col("n"))
          .orderBy("keep_id"),
      Some(
        """SELECT min(doc_id) AS keep_id, md5(text) AS chk, count(*) AS n
          |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin
      )
    ),
    // MinHash + LSH near-dup pairs: signature → band keys → bucket
    // equi-join candidates → exact-Jaccard verify. Approximate candidate
    // recall ⇒ no SQL oracle (rows-only); exactness of survivors is
    // cross-checked by dedup_ngram.
    Q(
      "dedup_minhash",
      (s, d) =>
        minhashVerifiedPairs(s, d)
          .select(
            col("doc_a"), col("doc_b"),
            round(col("est_raw"), 6).as("est_jaccard"),
            round(col("jacc_raw"), 6).as("jacc")
          )
          .orderBy("doc_a", "doc_b"),
      None
    ),
    // The ORACLE-ELIGIBLE face of the minhash pipeline (r13 verdict
    // task #3): the sketch-dependent est_jaccard column is what blocked
    // a DuckDB oracle — the {doc_a, doc_b, jacc} half is exact (the
    // verify kernel computes true shingle Jaccard), so it gets the
    // dedup_ngram SQL shape as its oracle. The candidate set is made
    // COMPLETE for τ by construction (band candidates ∪ rare-prefix
    // candidates — see minhashVerifiedPairs), so the oracle equality is
    // provable, not banding luck, and survives corpus regeneration; the
    // probabilistic >= 0.8 recall SPEC on the pure-LSH path stays with
    // dedup_minhash itself.
    Q(
      "dedup_minhash_pairs",
      (s, d) =>
        minhashVerifiedPairs(s, d, completeForTau = true)
          .select(col("doc_a"), col("doc_b"), round(col("jacc_raw"), 6).as("jacc"))
          .orderBy("doc_a", "doc_b"),
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |s AS (SELECT doc_id,
           |        list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))) AS sh
           |      FROM t WHERE len(toks) >= $ShingleK)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
           |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jacc
           |FROM s a JOIN s b ON a.doc_id < b.doc_id
           |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
           |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardThreshold
           |ORDER BY doc_a, doc_b""".stripMargin
      )
    ),
    // SimHash near-dup pairs: 64-bit signature, 4×16-bit band keys
    // (pigeonhole: Hamming ≤ 3 ⇒ some band equal), verify bit_count(xor).
    Q(
      "dedup_simhash",
      (s, d) => {
        val base = simhashSigs(s, d)
        // NO materialization barrier here (r18 A/B, calm window,
        // min-of-6 at 32c: base.count() before the join measured
        // 0.708 s vs 0.625 s without — the duplicated cache build the
        // barrier removes is hidden by idle cores, the serialization
        // is not; the ts_concurrency receipt again). The cache-stats
        // race can still flip the broadcast build SIDE between runs,
        // but this self-join is key-symmetric — both sides are the
        // same cached sigs + Generate — so the flip is cost-neutral
        // and the bench skeleton canonicalizer classifies it as
        // such (BuildEither) instead of failing calm certification.
        // semDedup keeps its barrier: there the build side decides
        // whether the final aggregate pays an extra corpus exchange.
        val chunks = base.select(
          col("doc_id"), col("sig"),
          explode(array((0 until 4).map { c =>
            struct(lit(c).as("c"), shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
          }: _*)).as("chunk")
        )
        // distinct() is deliberate, NOT a 4x-duplicate tax: Catalyst
        // pushes the hamming<=3 filter below the aggregate AND into the
        // chunk-bucket join condition, so the distinct only ever shuffles
        // true near-dup pairs (tiny). A first-match-only variant ("no
        // earlier chunk equal" as a post-join predicate) was measured
        // 6.5x SLOWER at the 100x stress (578 vs 89 s): the predicate
        // lands ahead of the cheap killer conditions inside the join and
        // every bucket-probe match pays the full chain. (PLANS.md
        // "first-match-only candidate emission" for the experiment.)
        chunks
          .as("x")
          .join(
            chunks.as("y"),
            col("x.chunk") === col("y.chunk") && col("x.doc_id") < col("y.doc_id")
          )
          .select(
            col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long").as("hamming")
          )
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy("doc_a", "doc_b")
      },
      None
    ),
    // Exact n-gram Jaccard near-dup pairs with PPJoin-style prefix
    // filtering (rarePrefix): candidate generation stays COMPLETE for
    // Jaccard ≥ τ (two qualifying sets must share a rare-prefix
    // element), so the exact SQL oracle applies, while the rare-shingle
    // buckets keep the candidate join bounded at 100 TB.
    Q(
      "dedup_ngram",
      (s, d) =>
        ngramPairs(s, d)
          .select(col("doc_a"), col("doc_b"), round(col("jacc_raw"), 6).as("jacc"))
          .orderBy("doc_a", "doc_b"),
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |s AS (SELECT doc_id,
           |        list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))) AS sh
           |      FROM t WHERE len(toks) >= $ShingleK)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
           |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jacc
           |FROM s a JOIN s b ON a.doc_id < b.doc_id
           |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
           |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardThreshold
           |ORDER BY doc_a, doc_b""".stripMargin
      )
    ),
    // Incremental (batch-vs-corpus) near-dup detection — the shape a
    // daily ingestion pipeline actually runs: flag each ARRIVING doc
    // (every 10th doc stands in for the new batch) whose n-gram Jaccard
    // vs some EXISTING corpus doc is >= τ, without ever self-joining
    // the corpus. Candidates: the new doc's ⌊(1−τ)·sz⌋+1 rarest
    // shingles probe the corpus's full inverted index — complete for
    // Jaccard >= τ (at most (1−τ)·sz of a's shingles can be missing
    // from a qualifying partner, so some probe shingle is shared) —
    // then the merge kernel verifies exactly. Scale: index the corpus
    // once, probe per batch; probe-side shuffle is O(new batch), not
    // O(corpus).
    Q(
      "dedup_incremental",
      (s, d) => {
        val docs = documents(s, d)
        val pNew = shinglePayloadOf(s, docs.filter(col("doc_id") % 10 === 0)).persist()
        val pOld = shinglePayloadOf(s, docs.filter(col("doc_id") % 10 =!= 0)).persist()
        CacheTracker.track("dedup_incremental", pNew, pOld)
        val probe = rarePrefix(pNew, JaccardThreshold)
          .select(col("doc_id").as("new_id"), col("h"))
        val cand = probe
          .join(hashedInv(pOld).select(col("doc_id").as("old_id"), col("h")), "h")
          .select(col("new_id").as("doc_a"), col("old_id").as("doc_b"))
          .distinct()
        pairStats(s, cand, pNew.unionByName(pOld))
          .withColumn("jacc_raw", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
          .filter(col("jacc_raw") >= JaccardThreshold)
          .select(
            col("doc_a").as("new_id"),
            col("doc_b").as("corpus_id"),
            round(col("jacc_raw"), 6).as("jacc")
          )
          .orderBy("new_id", "corpus_id")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id,
           |        list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))) AS sh
           |      FROM t WHERE len(toks) >= $ShingleK)
           |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
           |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
           |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jacc
           |FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
           |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
           |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardThreshold
           |ORDER BY new_id, corpus_id""".stripMargin
      )
    ),
    // Asymmetric containment near-dups: pairs where the SMALLER shingle
    // set is ≥ 90% contained in the other — catches sub-document
    // duplication (quotes, boilerplate inclusion, doc-within-doc) that
    // symmetric Jaccard misses (a short doc inside a long one has tiny
    // Jaccard but containment ≈ 1). Candidates: each doc PROBES the
    // inverted index with its ⌊(1−τ)·sz⌋+1 globally-rarest shingles —
    // if containment ≥ τ, fewer than that many of its shingles are
    // missing from the partner, so some probe shingle is shared, and
    // the full index side guarantees the partner sees it (complete for
    // τ; the probe side stays rare-shingle-bounded). Exact verify via
    // the sorted-hash merge kernel.
    Q(
      "dedup_containment",
      (s, d) => {
        val payload = shinglePayloadOf(s, documents(s, d)).persist()
        CacheTracker.track("dedup_containment", payload)
        val inv = hashedInv(payload)
        val probe = rarePrefix(payload, ContainmentThreshold)
          .select(col("doc_id").as("p_id"), col("h"))
        val cand = probe
          .join(inv.select(col("doc_id").as("i_id"), col("h")), "h")
          .filter(col("p_id") =!= col("i_id"))
          .select(
            least(col("p_id"), col("i_id")).as("doc_a"),
            greatest(col("p_id"), col("i_id")).as("doc_b")
          )
          .distinct()
        pairStats(s, cand, payload)
          .withColumn("cont_raw", col("inter") / least(col("sz_a"), col("sz_b")))
          .filter(col("cont_raw") >= ContainmentThreshold)
          .select(
            col("doc_a"),
            col("doc_b"),
            col("inter").as("n_shared"),
            round(col("cont_raw"), 6).as("cont")
          )
          .orderBy("doc_a", "doc_b")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id,
           |        list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))) AS sh
           |      FROM t WHERE len(toks) >= $ShingleK)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_shared,
           |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
           |        / least(len(a.sh), len(b.sh)), 6) AS cont
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
           |      / least(len(a.sh), len(b.sh)) >= $ContainmentThreshold
           |ORDER BY doc_a, doc_b""".stripMargin
      )
    ),
    // Near-dup cluster assignment: connected components over the exact
    // n-gram pair graph — what a dedup pipeline actually consumes (pick
    // one survivor per transitive cluster, not per pair). Each round
    // HOOKS every node to the min label in its closed neighborhood
    // (equi-join + map-side-combined groupBy min), then SHORTCUTS by
    // pointer doubling — l(v) ← l(l(v)), one self-equi-join of the
    // label table — so the distance a label has traveled doubles per
    // round and convergence is O(log diameter) rounds, not
    // O(diameter) (the r12 verdict item: plain min-propagation walked
    // a diameter-54 chain in 54 rounds; hook+shortcut closes it in
    // ~7). Fixed point is exact: labels only decrease, stay member
    // ids of the component (hook takes a neighbor's label, shortcut a
    // member's label), and hook-stability forces label equality
    // across every edge — the constant must be the component min,
    // since the min's own label is itself a member id ≤ it. The only
    // driver-side value per round is the 1-row convergence count,
    // never data. Oracle: DuckDB recursive CTE computing min
    // reachable node — exact match.
    Q(
      "dedup_clusters",
      (s, d) => {
        val pairs = ngramPairs(s, d).select("doc_a", "doc_b")
        // localCheckpoint (not persist): persist caches DATA but every
        // round's plan would still carry the full ngramPairs subtree, and
        // each round references the previous labels TWICE (neighborMin +
        // the outer join), so the logical plan DOUBLES per round —
        // measured: 94K → 231K → 519K → 1.1M plan chars in 4 rounds, with
        // analysis/explain time growing to match (a deep-diameter
        // component OOMs the driver on plan strings alone). Eager
        // checkpointing cuts both sides: edges becomes a leaf once,
        // labels becomes a fresh leaf every round — flat per-round cost
        // in O(diameter) rounds. Fault-tolerance trade-off: local
        // checkpoint blocks live on executors with lineage TRUNCATED,
        // so on a real cluster losing an executor loses the labels
        // irrecoverably and the job fails (harmless on local[*]).
        // RELIABLE OPT-IN: set -Dgraft.checkpoint.dir (or env
        // GRAFT_CHECKPOINT_DIR) to a cluster-visible path and every
        // round checkpoints to reliable storage instead — labels
        // survive executor loss at the cost of one distributed-FS
        // write per round (see roundCheckpoint).
        val edges = roundCheckpoint(pairs
          .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
          .toDF("src", "dst"))
        var labels = roundCheckpoint(edges.select(col("src").as("id")).distinct()
          .withColumn("lbl", col("id")))
        var converged = false
        var iter = 0
        // cap = backstop against a pathological graph, not a tuning knob:
        // O(log diameter) rounds means 64 covers any graph that fits in
        // storage (2^63 diameter) with headroom for the +1 detect round
        while (!converged && iter < 64) {
          val neighborMin = edges
            .join(labels, edges("dst") === labels("id"))
            .groupBy(col("src"))
            .agg(min(col("lbl")).as("nlbl"))
          // hook: min over the closed neighborhood. Checkpointed — the
          // shortcut below reads it twice (probe + jump sides)
          val hooked = roundCheckpoint(labels
            .join(neighborMin, labels("id") === neighborMin("src"), "left")
            .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
          // shortcut (pointer doubling): l(v) ← l(l(v)). Labels are
          // node ids, so the jump side is total; left+coalesce only
          // guards the self-label rows a filter would re-shuffle for.
          val next = roundCheckpoint(hooked.as("a")
            .join(
              hooked.select(col("id").as("jid"), col("lbl").as("jlbl")).as("b"),
              col("a.lbl") === col("b.jid"), "left")
            .select(col("a.id").as("id"),
              coalesce(col("jlbl"), col("a.lbl")).as("lbl")))
          val changed = next.as("n")
            .join(labels.as("o"), col("n.id") === col("o.id"))
            .filter(col("n.lbl") < col("o.lbl"))
            .count() // 1-row aggregate, not a data collect
          labels = next
          converged = changed == 0
          iter += 1
        }
        // a silent cap-exit would report one real cluster as several
        if (!converged)
          throw new IllegalStateException(
            s"dedup_clusters: label propagation did not converge in $iter rounds " +
              "(pathological label graph); raise the iteration cap")
        LlmOps.lastClusterRounds.set(iter)
        labels.select(col("id").as("doc_id"), col("lbl").as("cluster")).orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id,
           |        list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))) AS sh
           |      FROM t WHERE len(toks) >= $ShingleK),
           |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
           |            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardThreshold),
           |e AS (SELECT doc_a AS s, doc_b AS t FROM p
           |      UNION SELECT doc_b, doc_a FROM p),
           |reach(s, t) AS (
           |  SELECT s, t FROM e
           |  UNION
           |  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
           |SELECT s AS doc_id, CAST(least(s, min(t)) AS BIGINT) AS cluster
           |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin
      )
    ),
    // Embedding cosine near-dup pairs — exact pairwise (oracle-checked).
    // The scalable path for this op is the LSH/IVF bucketing in
    // sim_ann_ivf; this exact variant is the correctness baseline.
    Q(
      "dedup_embedding",
      (s, d) => {
        // Distributed block-pair all-pairs with rows kept as rows:
        // vectors are hashed into B fixed blocks and each VECTOR ROW is
        // replicated to the unordered block pairs it participates in via
        // a broadcast join against the tiny B(B+1)/2 pair table. A block
        // is never materialized as one collect_list row — so nothing
        // approaches Spark's ~2 GiB single-row/array buffer regardless
        // of block size; per-task memory is two iterator-built arrays
        // bounded by block size (executor heap, and at 100 TB you raise
        // B so a block stays executor-sized — the quadratic work is
        // inherent to exact all-pairs, this shape is how it
        // distributes). cogroup on the pair id hands each task both
        // sides as iterators and the tight double-precision kernel runs
        // inside; accumulation order (dims left-to-right, dot/(na·nb))
        // matches DuckDB's list_cosine_similarity bit-for-bit.
        val sp = s
        import sp.implicits._
        val B = EmbedBlocks
        // persist: scanned once per side of the pair join. NULL vectors
        // are incomparable — excluded here exactly as the oracle's
        // NULL-propagating `list_cosine_similarity >= thr` excludes them
        val tagged = embeddings(s, d)
          .filter(col("embedding").isNotNull)
          .select(
            pmod(col("vec_id"), lit(B.toLong)).cast("int").as("bid"),
            col("vec_id"), col("embedding"))
          .persist()
        CacheTracker.track("dedup_embedding", tagged)
        // pid encodes the unordered pair {a,b} with a <= b: pid = a*B + b
        val pairTbl = (for { a <- 0 until B; b <- a until B } yield (a * B + b, a, b))
          .toDF("pid", "ba", "bb")
        val sideA = tagged
          .join(broadcast(pairTbl), col("bid") === col("ba"))
          .select(col("pid"), col("vec_id"), col("embedding"))
          .as[(Int, Long, Array[Float])]
        // diagonal pairs (a == b) live entirely on side A; side B carries
        // only strictly-off-diagonal blocks so a diagonal block is not
        // shuffled twice
        val sideB = tagged
          .join(broadcast(pairTbl.filter(col("ba") =!= col("bb"))), col("bid") === col("bb"))
          .select(col("pid"), col("vec_id"), col("embedding"))
          .as[(Int, Long, Array[Float])]
        val thr = CosineDupThreshold
        def prep(xs: Iterator[(Int, Long, Array[Float])]): Array[(Long, Array[Double], Double)] =
          xs.map { case (_, id, v) =>
            val a = new Array[Double](v.length)
            var n2 = 0.0; var i = 0
            while (i < v.length) { a(i) = v(i).toDouble; n2 += a(i) * a(i); i += 1 }
            (id, a, math.sqrt(n2))
          }.toArray
        sideA.groupByKey(_._1)
          .cogroup(sideB.groupByKey(_._1)) { (pid, ita, itb) =>
            val same = (pid / B) == (pid % B)
            val pa = prep(ita)
            val pb = if (same) pa else prep(itb)
            // each unordered {i,j} lives in exactly one block pair, so no
            // cross-task dedup is needed; within a block emit i<j once
            pa.iterator.flatMap { case (ida, va, na) =>
              pb.iterator
                .filter(p => if (same) p._1 > ida else p._1 != ida)
                .flatMap { case (idb, vb, nb) =>
                  var dot = 0.0; var j = 0
                  while (j < va.length) { dot += va(j) * vb(j); j += 1 }
                  val cos = dot / (na * nb)
                  if (cos >= thr)
                    Iterator.single((math.min(ida, idb), math.max(ida, idb), cos))
                  else Iterator.empty
                }
            }
          }
          .toDF("id_a", "id_b", "cos_raw")
          .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos"))
          .orderBy("id_a", "id_b")
      },
      Some(
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos
           |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                             CAST(b.embedding AS DOUBLE[])) >= $CosineDupThreshold
           |ORDER BY id_a, id_b""".stripMargin
      )
    ),
    // SemDeDup semantic dedup: cluster-bucketed near-dup drop list —
    // the approximate scale path for dedup_embedding's exact all-pairs
    // (see [[semDedup]]). No oracle by design (cross-cell recall);
    // soundness + exact decision-rule equality spec'd in LlmOpsSpec.
    Q(
      "dedup_semantic",
      (s, d) => semDedup(s, embeddings(s, d).filter(col("embedding").isNotNull), IvfCentroids, CosineDupThreshold),
      None
    ),
    // ---- similarity search --------------------------------------------
    // Brute-force cosine top-k vs a probe vector (vec_id 0) — the exact
    // baseline every ANN variant is measured against.
    Q(
      "sim_cosine_topk",
      (s, d) => {
        // finiteVec: a vector with a non-finite component is a NULL
        // vector (Grid.scala pin) — a NaN score would otherwise rank
        // TOP in the desc order on both engines from different rows
        val e = embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
        // feed the FLOAT arrays straight to the expression: it widens
        // per element in both eval and codegen (bit-identical to a
        // transform-to-double first — oracle hash-equal), and skipping
        // the toDouble higher-order wrapper keeps the projection
        // inside whole-stage codegen — HOFs are CodegenFallback, and
        // the interpreted Project plus a per-row converted-array
        // allocation was the measured cost of this query (BASELINE.md
        // round-11 note; fusion pinned by the codegen-plan spec)
        val probe = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id"),
            round(CosineSimilarity.cosineSim(col("embedding"), col("probe")), 6).as("score")
          )
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10)
      },
      Some(
        // zero-norm cosine pinned to 0.0 on both sides (DuckDB's raw
        // list_cosine_similarity returns -1.0 there; the engine pins 0)
s"""WITH f AS (SELECT vec_id, ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings),
          |p AS (SELECT CAST(embedding AS DOUBLE[]) AS probe
          |           FROM f WHERE vec_id = 0 AND embedding IS NOT NULL)
          |SELECT e.vec_id,
          |       round(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
          |                                          CAST(e.embedding AS DOUBLE[])) = 0
          |                    OR list_inner_product(p.probe, p.probe) = 0 THEN 0.0
          |             ELSE list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe)
          |             END, 6) AS score
          |FROM f e, p WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL
          |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
      )
    ),
    // IVF approximate nearest neighbors: coarse-quantize to a CONSTANT-k
    // deterministic centroid sample (the k smallest xxhash64(vec_id) —
    // a TakeOrdered, O(n log k), independent of table size), probe the
    // nearest clusters, exact cosine only within candidates. At 100 TB
    // the assignment is a broadcast join on a k-row centroid table and
    // the probe touches a bounded fraction of partitions. Approximate ⇒
    // rows-only check; recall vs the exact sim_cosine_topk is spec'd.
    Q(
      "sim_ann_ivf",
      (s, d) => annIvf(s, embeddings(s, d).filter(col("embedding").isNotNull), IvfCentroids, IvfProbes),
      None
    ),
    // LSH-bucketed approximate nearest neighbors — the second ANN
    // family (random-hyperplane / signed random projection), bucketed
    // by a CONSTANT-width code with a constant multi-probe radius: the
    // corpus is coded in one narrow kernel stage, the query's probe
    // codes broadcast (≤ 2^bits rows), candidates come from a bucketed
    // equi-join on the code, and exact cosine re-ranks only candidates.
    // At 100 TB: no centroid table at all (hyperplanes are regenerated
    // from the hash), assignment is embarrassingly parallel, and the
    // probe touches a bounded fraction of buckets. Approximate ⇒
    // rows-only check; recall vs sim_cosine_topk is spec'd.
    Q(
      "sim_ann_lsh",
      (s, d) => annLsh(s, embeddings(s, d).filter(col("embedding").isNotNull), LshBits, LshProbe),
      None
    ),
    // Batched IVF ANN: approximate top-5 for EVERY query vector —
    // sim_knn_batch's scale substitute when exact O(n·q) is too much:
    // constant centroid broadcast, bucketed cluster equi-join, bounded
    // top-k aggregation. Approximate ⇒ rows-only check; recall vs the
    // exact sim_knn_batch is spec'd (LlmOpsSpec).
    Q(
      "sim_ann_batch",
      (s, d) => annIvfBatch(s, embeddings(s, d).filter(col("embedding").isNotNull), IvfCentroids, IvfProbes, 5),
      None
    ),
    // IVF-PQ ANN: probed IVF clusters ranked by product-quantized
    // asymmetric-distance scores (each candidate read as m sub-codes,
    // not the full vector), exact cosine only on the bounded ADC
    // survivor set — the index shape that scales past IVF-Flat at
    // 100 TB (see [[annIvfPq]]). Approximate ⇒ rows-only check; recall
    // vs sim_cosine_topk spec'd.
    Q(
      "sim_ann_ivfpq",
      (s, d) =>
        annIvfPq(s, embeddings(s, d).filter(col("embedding").isNotNull), IvfCentroids, IvfProbes, PqM, PqSub, PqK, PqRerank),
      None
    ),
    // Batch exact kNN: top-5 neighbors for EVERY query vector (the
    // realistic similarity-search shape — a query SET, not one probe).
    // The query side broadcasts; selection is a bounded-heap typed
    // Aggregator ([[graft.functions.TopKAggregator]]) whose map-side
    // partial aggregation reduces each partition to k candidates per
    // query BEFORE the shuffle — O(partitions·k·q) exchanged rows where
    // a row_number ranking window would shuffle and sort the full n×q
    // candidate set. Exact and deterministic ⇒ fully oracle-checked.
    Q(
      "sim_knn_batch",
      (s, d) => {
        val sp = s
        import sp.implicits._
        import graft.functions.{Scored, TopKAggregator}
        // NULL vectors can neither query nor be retrieved — the filter
        // is mirrored in the oracle SQL (both sides would otherwise
        // rank NULL scores, and a typed Scored.score cannot hold one)
        val e = embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
        val queries = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val scored = e.filter(col("vec_id") % 100 =!= 0)
          .crossJoin(broadcast(queries))
          .select(
            col("q_id").as("qId"),
            // float arrays direct: same double math inside the
            // expression, no codegen-breaking HOF cast (see
            // sim_cosine_topk)
            CosineSimilarity.cosineSim(col("embedding"), col("qv")).as("score"),
            col("vec_id").as("vecId")
          )
          .as[Scored]
        scored
          .groupByKey(_.qId)
          .agg(new TopKAggregator(5).toColumn.name("top"))
          .toDF("q_id", "top")
          .select(col("q_id"), posexplode(col("top.items")).as(Seq("pos0", "c")))
          .select(
            col("q_id"),
            (col("pos0") + 1).cast("long").as("rank"),
            col("c.vecId").as("vec_id"),
            round(col("c.score"), 6).as("score")
          )
          .orderBy("q_id", "rank")
      },
      Some(
s"""WITH f AS (SELECT vec_id, ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings),
          |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
          |           FROM f WHERE vec_id % 100 = 0 AND embedding IS NOT NULL),
          |c AS (SELECT q.q_id, e.vec_id,
          |        CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
          |                                     CAST(e.embedding AS DOUBLE[])) = 0
          |               OR list_inner_product(q.qv, q.qv) = 0 THEN 0.0
          |        ELSE list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
          |        END AS s
          |      FROM f e, q
          |      WHERE e.vec_id % 100 <> 0 AND e.embedding IS NOT NULL),
          |r AS (SELECT q_id, vec_id, s,
          |        row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id) AS rn
          |      FROM c)
          |SELECT q_id, rn AS rank, vec_id, round(s, 6) AS score
          |FROM r WHERE rn <= 5 ORDER BY q_id, rank""".stripMargin
      )
    ),
    // Document chunking: overlapping token windows (length 50, stride
    // 40) — the standard pretraining / RAG preparation step that turns
    // documents into model-sized passages. Shuffle-free at any scale:
    // scan → split → generate (one row per window), no aggregation, no
    // join; the oracle-mandated ORDER BY is the only exchange and a
    // consumer drops it.
    Q(
      "text_chunk",
      (s, d) => {
        val chunkLen = 50
        val stride = 40
        documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(
            col("doc_id"), col("toks"),
            posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
              .as(Seq("pos0", "start"))
          )
          .select(
            col("doc_id"),
            col("pos0").cast("long").as("chunk_id"),
            size(slice(col("toks"), col("start") + 1, lit(chunkLen))).cast("long").as("n_tokens"),
            concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkLen))).as("chunk")
          )
          .orderBy("doc_id", "chunk_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start FROM t)
          |SELECT doc_id, start // 40 AS chunk_id,
          |       CAST(len(toks[start+1:start+50]) AS BIGINT) AS n_tokens,
          |       array_to_string(toks[start+1:start+50], ' ') AS chunk
          |FROM g ORDER BY doc_id, chunk_id""".stripMargin
      )
    ),
    // Deterministic stratified sampling — downsample overrepresented
    // strata (here: language) with REPRODUCIBLE membership: a row is in
    // the sample iff md5(doc_id) mod 10k falls under its stratum's
    // threshold. No RNG, no seed-state: membership is a pure function of
    // the key, so re-runs, retries and incremental reprocessing at
    // 100 TB select the identical sample (rate-change = superset/subset,
    // monotone in the threshold). One scan + filter, no shuffle; the
    // same expression runs in DuckDB, so it is oracle-checked exactly.
    Q(
      "sample_stratified",
      (s, d) => {
        val bucket =
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 10000
        val threshold = when(col("lang") === "en", 2000)
          .when(col("lang") === "de", 4000)
          .when(col("lang") === "fr", 6000)
          .when(col("lang") === "es", 8000)
          .otherwise(10000)
        documents(s, d)
          .filter(bucket < threshold)
          .select(col("doc_id"), col("lang"), bucket.as("bucket"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id, lang,
          |  CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 10000 AS bucket
          |FROM documents
          |WHERE CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 10000 <
          |  CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 4000
          |            WHEN 'fr' THEN 6000 WHEN 'es' THEN 8000 ELSE 10000 END
          |ORDER BY doc_id""".stripMargin
      )
    ),
    // Corpus-wide top-k word bigrams — the frequency table a tokenizer
    // (BPE-style merge selection) or collocation analysis starts from.
    // posexplode + lead window builds bigrams codegen'd; the count is a
    // two-phase hash aggregate and the top-k a TakeOrdered — no global
    // sort of the full bigram table.
    Q(
      "text_ngram_topk",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(100)
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |b AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram
          |      FROM t, unnest(range(1, len(toks))) r(i))
          |SELECT bigram, count(*) AS n FROM b GROUP BY bigram
          |ORDER BY n DESC, bigram LIMIT 100""".stripMargin
      )
    ),
    // Corpus vocabulary statistics — size, hapax legomena, type/token
    // ratio: the health metrics of a tokenizer-training corpus. One
    // explode + two hash aggregations.
    Q(
      "text_vocab_stats",
      (s, d) => {
        val toks = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(explode(wsTokens(col("text"))).as("tok"))
        // ratio as integer ppm (floor of vocab·1e6/total) — a float
        // round() of the off-grid rational is exactly the cross-engine
        // round-half hazard the integer-scaled quality score exists to
        // avoid
        toks
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .agg(
            sum(col("n")).as("total_tokens"),
            count(lit(1)).as("vocab_size"),
            sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax")
          )
          .select(
            col("total_tokens"), col("vocab_size"), col("hapax"),
            intDiv(col("vocab_size") * lit(1000000L), col("total_tokens"))
              .as("ttr_ppm")
          )
      },
      Some(
        """WITH e AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
          |v AS (SELECT tok, count(*) AS n FROM e GROUP BY tok)
          |SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
          |       count(*) AS vocab_size,
          |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
          |       CAST((count(*) * 1000000) // sum(n) AS BIGINT) AS ttr_ppm
          |FROM v""".stripMargin
      )
    ),
    // Intra-document repetition removal — the within-doc cleaning step
    // (dedup repeated tokens keeping FIRST occurrence, order preserved):
    // explode with position → min-position per distinct token (one
    // map-side-combinable aggregation) → re-assemble in first-seen
    // order. The per-doc re-assembly (sort_array + transform over an
    // already-deduped array) is interpreted but O(|doc|); the heavy
    // lifting — explode + min-agg — is codegen'd and shuffles once.
    Q(
      "text_dedup_words",
      (s, d) => {
        val firstSeen = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
          .groupBy("doc_id", "tok")
          .agg(min(col("pos")).as("mpos"))
        firstSeen
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_unique"),
            sort_array(collect_list(struct(col("mpos"), col("tok")))).as("ordered")
          )
          .select(
            col("doc_id"),
            concat_ws(" ", transform(col("ordered"), e => e.getField("tok"))).as("clean_text"),
            col("n_unique")
          )
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |e AS (SELECT doc_id, unnest(toks) AS tok,
          |             unnest(range(1, len(toks) + 1)) AS ord FROM t),
          |u AS (SELECT doc_id, tok, min(ord) AS mpos FROM e GROUP BY doc_id, tok)
          |SELECT doc_id,
          |  string_agg(tok, ' ' ORDER BY mpos) AS clean_text,
          |  count(*) AS n_unique
          |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin
      )
    ),
    // Composite corpus-cleaning pipeline — the end-to-end shape a
    // training-data job actually runs: exact-dedup survivors ⋈ quality
    // gate ⋈ language gate, emitting the kept docs with their stats.
    // One aggregation (dedup survivors) + one broadcast-able join back
    // to the doc table + codegen'd scalar filters; every stage is a
    // shuffle already bounded by its operator. Oracle-checked end to end.
    Q(
      "corpus_clean",
      (s, d) => {
        val survivors = documents(s, d)
          .groupBy(md5(col("text")).as("chk"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        documents(s, d)
          .join(survivors, "doc_id")
          .filter(col("lang") === "en")
          .withColumn("quality", qualityScore(col("text")))
          .filter(col("quality") >= 0.46)
          .select(
            col("doc_id"), col("quality"),
            size(wsTokens(col("text"))).cast("long").as("n_tokens")
          )
          .orderBy("doc_id")
      },
      Some(
        """WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
          |q AS (SELECT d.doc_id,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
          |  CAST(length(text) AS BIGINT) AS c,
          |  CAST(len(list_filter(string_split(text, ' '),
          |       w -> w IN ('the','a','of','and','to','in','is','that'))) AS BIGINT) AS s,
          |  CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS BIGINT) AS a
          |  FROM documents d JOIN surv USING (doc_id) WHERE lang = 'en')
          |SELECT doc_id,
          |  CASE WHEN c = 0 THEN NULL ELSE
          |  ((CAST(40*s*c + 3*least((c-n+1)*c, 10*n*c) + 30*a*n AS HUGEINT) * 2000000 + 100*n*c)
          |    // (2*100*n*c)) END / 1000000.0 AS quality,
          |  n AS n_tokens
          |FROM q
          |WHERE CASE WHEN c = 0 THEN FALSE ELSE
          |  ((CAST(40*s*c + 3*least((c-n+1)*c, 10*n*c) + 30*a*n AS HUGEINT) * 2000000 + 100*n*c)
          |    // (2*100*n*c)) / 1000000.0 >= 0.46 END
          |ORDER BY doc_id""".stripMargin
      )
    ),
    // ---- multimodal ----------------------------------------------------
    // Opaque binary payloads with typed metadata: byte length + checksum
    // derived entirely inside the engine (oracle-checked).
    Q(
      "multimodal_meta",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
            md5(encode(col("text"), "UTF-8")).as("chk")
          )
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |       md5(text) AS chk
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ),
    // Frame sampling over a binary media column — every stride-th
    // fixed-size frame (64 B frames, stride 4), the raw-buffer layout
    // video/audio pipelines subsample before decode. Unlike the decode
    // stage (stubbed below — no codecs in this container), raw-frame
    // slicing needs NO codec, so this op is REAL end to end and fully
    // oracle-checked: the engine slices true bytes
    // (substring-on-binary, codegen'd) and emits per-frame byte counts
    // + checksums; the oracle slices the text (the fixture is verified
    // pure ASCII, so byte and char offsets coincide) and hashes the
    // same bytes. Scan → sequence+posexplode → project: no shuffle at
    // all except the oracle-mandated sort, output bounded at
    // 1/(stride) of input bytes.
    Q(
      "multimodal_framesample",
      (s, d) => {
        val frameB = 64; val strideB = 256 // 64-byte frames, every 4th
        val b = encode(col("text"), "UTF-8")
        documents(s, d)
          .select(col("doc_id"), b.as("b"), length(b).as("len"))
          .select(
            col("doc_id"),
            col("b"),
            // empty/NULL text has no frames: Spark's sequence(1, 0)
            // THROWS ("Illegal sequence boundaries") rather than
            // returning empty — a zero-length document crashed the
            // whole job until the VerifyFuzz empty-text corpus caught
            // it. Guard to an empty offset array instead.
            explode(
              when(col("len") >= 1, sequence(lit(1), col("len"), lit(strideB)))
                .otherwise(array().cast("array<int>"))).as("off")
          )
          .select(
            col("doc_id"),
            intDiv(col("off") - 1, lit(frameB)).as("frame_idx"),
            col("off").cast("long").as("off"),
            length(expr(s"substring(b, off, $frameB)")).cast("long").as("n_bytes"),
            // checksum of the HEX of the byte slice (not the raw
            // bytes): DuckDB has neither BLOB substring nor md5(BLOB),
            // so the oracle slices hex(b) at doubled offsets — the
            // comparison stays BYTE-exact on any input (the old
            // char-sliced oracle was only equal on pure-ASCII text;
            // the fuzz's unicode docs broke that coincidence)
            md5(hex(expr(s"substring(b, off, $frameB)"))).as("chk")
          )
          .orderBy("doc_id", "frame_idx")
      },
      Some(
        """WITH t AS (SELECT doc_id, hex(encode(text)) AS h,
          |             octet_length(encode(text)) AS len FROM documents),
          |f AS (SELECT doc_id, h, unnest(range(1, len + 1, 256)) AS off FROM t)
          |SELECT doc_id,
          |  (off - 1) // 64 AS frame_idx,
          |  CAST(off AS BIGINT) AS off,
          |  CAST(length(substring(h, (off - 1) * 2 + 1, 128)) // 2 AS BIGINT) AS n_bytes,
          |  md5(substring(h, (off - 1) * 2 + 1, 128)) AS chk
          |FROM f ORDER BY doc_id, frame_idx""".stripMargin
      )
    ),
    // Decode / feature-extract over binary media columns via typed
    // mapPartitions (the batch-iterator shape a decoder needs: one
    // task-local decoder instance, rows streamed through it, never a
    // whole partition of pixel buffers in memory at once). The decode
    // is REAL: image payloads (PNG/JPEG/GIF/BMP by magic bytes) go
    // through the JDK's javax.imageio to per-channel pixel statistics
    // (mean/std of R,G,B + dimensions — see [[imageFeatures]]); a
    // payload no shipped reader decodes falls back to deterministic
    // byte-histogram features, documented as exactly that (the corpus'
    // documents table carries text bytes, so the registered query
    // exercises the fallback; LlmOpsSpec drives the decode path with
    // in-fixture-generated PNGs and asserts closed-form channel
    // values).
    //
    // Output is long-form (doc_id, channel, value, n_frames) rows: the
    // feature vector is exploded to scalar rows so every column is
    // hashable/sortable by any downstream consumer (a raw ARRAY<FLOAT>
    // column is not, e.g. for pandas-side row hashing).
    Q(
      "multimodal_features",
      (s, d) => {
        val sp = s
        import sp.implicits._
        multimodalFeaturesOn(
          documents(s, d)
            .filter(col("text").isNotNull) // no blob → nothing to decode
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
            .as[(Long, Array[Byte])])
      },
      None
    ),
    // ---- training-prep ------------------------------------------------
    // Token-budget shard assignment: per language, documents in stable
    // (doc_id) order are concatenated into a token stream and each doc
    // lands in the shard holding its first token — the
    // concatenate-and-split sequence-packing layout of LLM pretraining
    // loaders. The running offset is an ordered prefix sum over a
    // ~5-value `lang` key, so a naive `sum OVER (PARTITION BY lang)`
    // would serialize each language's ENTIRE corpus into one window
    // task (round-7 verdict weak mark). Distributed two-level form
    // instead: (1) block rows by doc_id div B — doc_id is unique, so
    // every (lang, block) window partition is bounded at B rows no
    // matter how the ids are distributed; (2) per-(lang, block) token
    // totals via a map-side-partial groupBy; (3) exclusive prefix sum
    // of those totals per lang — a window over the BLOCKS table
    // (corpus/B rows ≈ metadata-sized: ~2.4M rows at 10^10 docs, and B
    // scales up if that ever matters); (4) broadcast the block base
    // offsets back and finish with a block-local running sum. Same
    // rows, same oracle; the only data-sized steps are one partial agg
    // and one bounded-partition window exchange.
    Q(
      "pack_shards",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val blockSize = 4096L
        val base = documents(s, d)
          // NULL text → NULL token count (size() would report -1):
          // the row keeps its (doc_id, lang) identity with NULL
          // off/shard and contributes nothing to any prefix sum —
          // exactly the oracle's len(string_split(NULL)) arithmetic
          .withColumn("n_tok",
            when(col("text").isNotNull, size(wsTokens(col("text")))).cast("long"))
          .withColumn("blk", intDiv(col("doc_id"), lit(blockSize)))
        val wPrev = Window.partitionBy("lang").orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val blockBase = base
          .groupBy("lang", "blk")
          .agg(sum(col("n_tok")).as("blk_tok"))
          .withColumn("blk_off", coalesce(sum(col("blk_tok")).over(wPrev), lit(0L)))
          .select("lang", "blk", "blk_off")
        val wIn = Window.partitionBy("lang", "blk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base
          // null-safe on lang: a NULL language is a real partition in
          // the oracle's PARTITION BY lang — a plain equi-join would
          // silently drop those documents
          .join(broadcast(blockBase
              .withColumnRenamed("lang", "__lang")
              .withColumnRenamed("blk", "__blk")),
            col("lang") <=> col("__lang") && col("blk") === col("__blk"))
          .drop("__lang", "__blk")
          .withColumn("off", col("blk_off") + sum(col("n_tok")).over(wIn) - col("n_tok"))
          .select(
            col("doc_id"), col("lang"), col("n_tok"), col("off"),
            intDiv(col("off"), lit(4096L)).as("shard")
          )
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, lang,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents),
          |o AS (SELECT doc_id, lang, n_tok,
          |  sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS off
          |  FROM t)
          |SELECT doc_id, lang, n_tok, CAST(off AS BIGINT) AS off,
          |       CAST(off AS BIGINT) // 4096 AS shard
          |FROM o ORDER BY doc_id""".stripMargin
      )
    ),
    // BPE tokenizer-training statistic: corpus-wide adjacent character
    // pair counts, the quantity each BPE merge iteration maximizes. The
    // 100 TB shape is the VOCAB-FIRST reduction real BPE trainers use:
    // collapse the corpus to (word, freq) — Heaps'-law sized, orders of
    // magnitude smaller than the token stream — THEN expand each
    // distinct word once into its character pairs weighted by freq.
    // Two chained two-phase hash aggregations (both partial map-side),
    // one bounded generate over the vocab, TakeOrdered for the top-k;
    // nothing downstream of the first groupBy scales with corpus size.
    Q(
      "bpe_pair_counts",
      (s, d) =>
        documents(s, d)
          .select(explode(wsTokens(col("text"))).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy("w")
          .agg(count(lit(1)).as("freq"))
          .select(
            col("freq"),
            explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair")
          )
          .groupBy("pair")
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(50),
      Some(
        """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
          |wc AS (SELECT w, count(*) AS freq FROM words WHERE len(w) >= 2 GROUP BY w),
          |pairs AS (SELECT unnest(list_transform(range(1, len(w)),
          |                 i -> substr(w, CAST(i AS INT), 2))) AS pair,
          |                freq
          |          FROM wc)
          |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
          |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin
      )
    ),
    // The apply side of the tokenizer story (bpe_pair_counts is the
    // train-side statistic): TRAIN a K-level BPE merge list, then
    // encode the corpus with it and report per-doc token counts — the
    // number every packing / budget decision downstream consumes.
    // Training is the real (inherently sequential) algorithm: K times,
    // count adjacent token pairs under the CURRENT segmentation, merge
    // the most frequent pair (ties broken lexicographically), assign
    // it the next rank. The scale shape is vocab-first throughout:
    // the corpus collapses once to (word, freq) — Heaps'-law sized —
    // and each recount pass runs over the CACHED vocab only
    // (distributed flatMap + two-phase agg + TakeOrdered(1); the only
    // thing collected per level is the single argmax row). Merges are
    // keyed by token PAIR (TextKernels.bpePairKey), not concatenation
    // — concat keys are ambiguous once tokens are multi-character.
    // Encoding reuses the vocab: each DISTINCT word is encoded once
    // (TextKernels.bpeSegment, best-rank-first to fixpoint), the
    // corpus-sized side only joins the per-word count back (AQE
    // broadcasts the vocab side) before a two-phase per-doc agg. Not
    // SQL-expressible (the merge loop) ⇒ no oracle; the spec replays
    // the whole pipeline — K-level trainer included — with an
    // independent implementation.
    Q(
      "text_bpe_encode",
      (s, d) => {
        val sp = s
        import sp.implicits._
        val mergeLevels = 8
        val words = documents(s, d)
          .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
        val vocab = words.groupBy("w").agg(count(lit(1)).as("freq"))
        // cache for the K sequential recount passes only; unpersisted
        // before returning (the final plan re-derives vocab in one pass)
        val vds = vocab.as[(String, Long)].persist()
        val merges = scala.collection.mutable.Map.empty[String, Int]
        var level = 0
        var exhausted = false
        var recounts = 0
        // Each driver round recounts ONCE and admits a BATCH of merges
        // that is provably identical to what the sequential trainer
        // (recount → merge argmax → repeat) would pick — the r12 "K
        // sequential jobs" note, closed without changing a single
        // learned merge. The admission test rests on the exact effect
        // of merging p=(a,b) on any other pair q=(c,d): an "a b"
        // bigram occurrence overlaps a "c d" occurrence only when
        // d = a or c = b, so q's count DECREASES in those cases and is
        // bit-exactly UNCHANGED otherwise (unless a side of q IS the
        // concat string ab, which new ab-tokens can boost); the pairs
        // merging CREATES — (x,ab), (ab,y), (ab,ab), and cross-batch
        // (a₁b₁,a₂b₂) — count at most the old count of some pair of
        // form (·,a) or (b,·). Scanning candidates in the trainer's
        // own (count desc, key asc) order, a CONSECUTIVE PREFIX is
        // admitted while each candidate is provably unchanged by every
        // earlier admission (no side equals an earlier a as d, an
        // earlier b as c, or an earlier concat) AND its count strictly
        // exceeds the post-merge ceiling of every other pair. Two
        // classes bound that ceiling: (1) PURELY-CREATED pairs —
        // (x,ab), (ab,y), (ab,ab), cross-batch (a₁b₁,a₂b₂) — each
        // created occurrence maps injectively to an occurrence of some
        // old pair of form (·,aⱼ)/(bⱼ,·), so created ≤ Cmax = max over
        // collected pairs of those forms (64th count as the horizon
        // for pairs below the collection); (2) COLLIDED pairs — a
        // pre-existing pair whose side string already EQUALS an
        // admitted concat (the token "ab" existed before merging
        // (a,b), e.g. from an earlier level) keeps its old count AND
        // gains created occurrences, so its ceiling is old + Cmax with
        // old ≤ CollisionOld = max(its collected count, horizon if
        // uncollected). The admission bar is therefore
        // n > CollisionOld + Cmax — without the collision term a
        // collided pair's old+created could outrank a later-admitted
        // candidate and the learned merge list would silently diverge
        // from the sequential trainer's. Then every non-admitted pair
        // still ranks after the prefix at its turn — unchanged pairs
        // keep exact counts and tie-break order, decreased pairs only
        // fall, created/collided pairs sit under the ceiling — so the
        // sequential argmax sequence IS the prefix. The first
        // unprovable candidate stops the batch; worst case degenerates
        // to the sequential one-per-round.
        while (level < mergeLevels && !exhausted) {
          val bcRanks = s.sparkContext.broadcast(merges.toMap)
          val top = vds
            .flatMap { case (w, f) =>
              val segs = TextKernels.bpeSegment(w, bcRanks.value)
              Iterator.range(0, segs.length - 1)
                .map(i => (TextKernels.bpePairKey(segs(i), segs(i + 1)), f))
            }
            .toDF("pair", "f")
            .groupBy("pair")
            .agg(sum(col("f")).as("n"))
            .orderBy(col("n").desc, col("pair"))
            .limit(64)
            .as[(String, Long)]
            .collect()
          recounts += 1
          if (top.isEmpty) exhausted = true
          else {
            val split = top.map { case (pk, n) =>
              val Array(a, b) = pk.split(' '); (pk, a, b, n)
            }
            val horizon = top.last._2
            val lefts = scala.collection.mutable.HashSet.empty[String]
            val rights = scala.collection.mutable.HashSet.empty[String]
            val concats = scala.collection.mutable.HashSet.empty[String]
            val admitted = scala.collection.mutable.HashSet.empty[String]
            // created-pair ceiling under the admissions so far
            def cmax: Long = split.iterator
              .filter { case (pk, c, d, _) =>
                !admitted.contains(pk) && (lefts.contains(d) || rights.contains(c)) }
              .map(_._4).foldLeft(horizon)(math.max)
            // old-count ceiling of pairs whose side equals an admitted
            // concat (may be boosted by created occurrences on top of
            // a PRE-EXISTING count): their collected count if in the
            // table, the horizon if below it — existence of an
            // uncollected collided pair can't be ruled out driver-side,
            // so the horizon floor is unconditional
            def collisionOld: Long = split.iterator
              .filter { case (pk, c, d, _) =>
                !admitted.contains(pk) && (concats.contains(c) || concats.contains(d)) }
              .map(_._4).foldLeft(horizon)(math.max)
            var stopped = false
            var took = 0
            split.foreach { case (pk, a, b, n) =>
              if (!stopped && level < mergeLevels) {
                val unchanged = admitted.isEmpty ||
                  (!lefts.contains(b) && !rights.contains(a) &&
                    !concats.contains(a) && !concats.contains(b) &&
                    n > collisionOld + cmax)
                if (unchanged) {
                  merges(pk) = level; level += 1; took += 1
                  admitted += pk; lefts += a; rights += b; concats += (a + b)
                } else stopped = true
              }
            }
            if (took == 0) exhausted = true // defensive: cannot occur (head always admits)
          }
        }
        LlmOps.lastBpeRecounts.set(recounts)
        // keep the vocab cache ALIVE for the final plan (r18): the
        // encode side previously re-derived vocab from the corpus
        // (scan + explode + exchange + distinct-agg) although the
        // recount phase had just built it — reading the cached (word,
        // freq) table instead removes one of the final plan's two
        // corpus passes. Residency bounded by CacheTracker (the next
        // invocation evicts it); rebuilt from parquet every invocation.
        CacheTracker.track("text_bpe_encode", vds.toDF())
        val bc = s.sparkContext.broadcast(merges.toMap)
        val enc = vds
          .map { case (w, _) => (w, TextKernels.bpeTokenCount(w, bc.value).toLong) }
          .toDF("w", "n_tok")
        words
          .join(enc, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe"))
          .orderBy("doc_id")
      },
      None
    ),
    // Per-source corpus profile (RefinedWeb/Gopher-style domain stats):
    // doc count, token count, distinct-content count (exact-dup volume)
    // and byte volume per source — the aggregate a domain-level
    // keep/drop decision reads. All-BIGINT output (no float rounding
    // hazards); one hash shuffle on source; count(DISTINCT md5) is
    // Spark's two-phase distinct aggregate, so the per-source dedup
    // happens map-side before the exchange.
    Q(
      "corpus_sources",
      (s, d) =>
        documents(s, d)
          .groupBy("source")
          .agg(
            count(lit(1)).as("docs"),
            sum(size(wsTokens(col("text"))).cast("long")).as("toks"),
            countDistinct(md5(col("text"))).as("uniq"),
            sum(col("n_chars")).as("sum_chars")
          )
          .orderBy("source"),
      Some(
        """SELECT source,
          |  count(*) AS docs,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
          |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM documents GROUP BY source ORDER BY source""".stripMargin
      )
    ),
    // Corpus mixing (Pile/Dolma-style): sample each source down to a
    // per-source token budget with a DETERMINISTIC hash gate, so the mix
    // is reproducible and re-runnable incrementally (same doc always
    // makes the same keep/drop decision). rate_bp = the basis-point
    // acceptance rate min(10000, 10000·budget/served_tokens), computed
    // from a |sources|-row aggregate that broadcasts back onto the scan —
    // at 100 TB the only full-data passes are the token-count aggregate
    // (two-phase, collapses map-side to one row per source per task) and
    // the gated scan itself; no wide shuffle anywhere. All-integer rate
    // arithmetic (IntegralDivide), so both engines gate identically.
    Q(
      "corpus_mix",
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("n_tok", size(wsTokens(col("text"))).cast("long"))
        val budget = when(col("source").isin("src1", "src2", "src3"), lit(2000L))
          .otherwise(lit(500L))
        val rates = docs
          .groupBy("source")
          .agg(sum(col("n_tok")).as("tok_s"))
          .select(
            col("source"),
            least(lit(10000L), intDiv(lit(10000L) * budget, col("tok_s")))
              .as("rate_bp")
          )
        val bucket =
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 10000
        docs
          .join(broadcast(rates), Seq("source"))
          .filter(bucket < col("rate_bp"))
          .select(col("doc_id"), col("source"), col("n_tok"), col("rate_bp"))
          .orderBy("doc_id")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |           FROM documents),
          |r AS (SELECT source,
          |        least(10000, (10000 * CASE WHEN source IN ('src1','src2','src3')
          |                                   THEN 2000 ELSE 500 END)
          |              // sum(n_tok)) AS rate_bp
          |      FROM d GROUP BY source)
          |SELECT d.doc_id, d.source, d.n_tok, CAST(r.rate_bp AS BIGINT) AS rate_bp
          |FROM d JOIN r USING (source)
          |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          |      < r.rate_bp
          |ORDER BY doc_id""".stripMargin
      )
    ),
    // Temperature-based source re-weighting (the T5/LLaMA mixing rule):
    // source weights ∝ tok_s^α with α = 1/2, so small sources are
    // up-sampled relative to proportional mixing — the standard
    // anti-domination knob for multi-source training corpora. Exact
    // cross-engine: w_s = floor(sqrt(tok_s)) (IEEE-correctly-rounded
    // sqrt is identical in both engines; floor makes it integral), all
    // later arithmetic BIGINT; membership is the same pure-row md5
    // basis-point gate as corpus_mix. Plan: two tiny source-level aggs
    // (sources × 1 row, broadcast back), then a broadcast join + filter
    // over the scan — model tables source-count-sized at any corpus.
    Q(
      "corpus_mix_temperature",
      (s, d) => {
        val B = 3000L // global token budget
        val docs = documents(s, d)
          .withColumn("n_tok", size(wsTokens(col("text"))).cast("long"))
        val bySource = docs
          .groupBy("source")
          .agg(sum(col("n_tok")).as("tok_s"))
          .withColumn("w", floor(sqrt(col("tok_s"))).cast("long"))
        val totalW = bySource.groupBy().agg(sum(col("w")).as("tot_w"))
        val rates = bySource
          .crossJoin(broadcast(totalW))
          .select(
            col("source"),
            least(
              lit(10000L),
              intDiv(lit(10000L) * lit(B) * col("w"), col("tot_w") * col("tok_s"))
            ).as("rate_bp")
          )
        val bucket =
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 10000
        docs
          .join(broadcast(rates), Seq("source"))
          .filter(bucket < col("rate_bp"))
          .select(col("doc_id"), col("source"), col("n_tok"), col("rate_bp"))
          .orderBy("doc_id")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |           FROM documents),
          |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_s,
          |        CAST(floor(sqrt(CAST(sum(n_tok) AS BIGINT))) AS BIGINT) AS w
          |      FROM d GROUP BY source),
          |t AS (SELECT CAST(sum(w) AS BIGINT) AS tot_w FROM s),
          |r AS (SELECT source,
          |        least(10000, (10000 * 3000 * w) // (tot_w * tok_s)) AS rate_bp
          |      FROM s, t)
          |SELECT d.doc_id, d.source, d.n_tok, CAST(r.rate_bp AS BIGINT) AS rate_bp
          |FROM d JOIN r USING (source)
          |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          |      < r.rate_bp
          |ORDER BY doc_id""".stripMargin
      )
    ),
    // Gopher-style repetition quality metrics: duplicate-word fraction
    // and top-bigram fraction per doc, emitted as exact fixed-point ppm
    // (BIGINT rational, round-half-up — no float round-half boundary).
    // One narrow kernel stage ([[TextKernels.repetitionStats]]); the
    // oracle recomputes the same counts relationally.
    Q(
      "text_repetition",
      (s, d) => {
        val sp = s
        import sp.implicits._
        documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            // a NULL text keeps its doc row with NULL stats (the oracle's
            // per-doc select does); -1 is the typed-tuple sentinel the
            // projection below masks back to SQL NULL
            if (text == null) (id, -1L, -1L, -1L)
            else {
              val (n, nd, topb) = TextKernels.repetitionStats(text)
              (id, n, nd, topb)
            }
          }
          .toDF("doc_id", "n", "nd", "topb")
          .select(
            col("doc_id"),
            when(col("n") >= 0, col("n")).as("n_tok"),
            when(col("n") >= 0,
              intDiv((col("n") - col("nd")) * lit(2000000L) + col("n"), col("n") * lit(2L))
                .cast("double") / 1000000.0).as("dup_word_frac"),
            when(
              col("n") >= 2,
              intDiv(col("topb") * lit(2000000L) + (col("n") - lit(1L)), (col("n") - lit(1L)) * lit(2L))
                .cast("double") / 1000000.0
            ).as("top_bigram_frac")
          )
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |s AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd FROM t),
          |bg AS (SELECT doc_id,
          |         unnest(list_transform(range(1, len(toks)),
          |                i -> toks[i] || ' ' || toks[i+1])) AS b
          |       FROM t),
          |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
          |tb AS (SELECT doc_id, max(c) AS topb FROM bc GROUP BY doc_id)
          |SELECT s.doc_id,
          |  CAST(s.n AS BIGINT) AS n_tok,
          |  ((s.n - s.nd)*2000000 + s.n) // (2*s.n) / 1000000.0 AS dup_word_frac,
          |  CASE WHEN s.n >= 2 THEN
          |    (tb.topb*2000000 + (s.n - 1)) // (2*(s.n - 1)) / 1000000.0
          |  END AS top_bigram_frac
          |FROM s LEFT JOIN tb ON s.doc_id = tb.doc_id
          |ORDER BY s.doc_id""".stripMargin
      )
    ),
    // PII detection + redaction: per-doc counts of email / IPv4 /
    // long-digit-run matches and an md5 of the redacted text (counts
    // prove detection, the digest proves the rewrite without shipping
    // 2× text through the compare). All codegen'd regexp expressions on
    // a single scan — no shuffle at any scale. Patterns stay in the
    // RE2-compatible subset (classes, bounded repeats, \b \d) so Java
    // regex and DuckDB RE2 match identically; replacements apply in the
    // same order in both engines, so overlaps resolve identically too.
    Q(
      "text_pii",
      (s, d) => {
        val redacted = regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"
          ),
          IdNumRe, "<NUM>"
        )
        documents(s, d)
          .select(
            col("doc_id"),
            regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
            regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
            regexp_count(col("text"), lit(IdNumRe)).cast("long").as("n_idnum"),
            md5(redacted).as("redacted_md5")
          )
          .orderBy("doc_id")
      },
      Some(
        s"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
           |  CAST(len(regexp_extract_all(text, '$IdNumRe')) AS BIGINT) AS n_idnum,
           |  md5(regexp_replace(regexp_replace(regexp_replace(text,
           |      '$EmailRe', '<EMAIL>', 'g'),
           |      '$Ipv4Re', '<IP>', 'g'),
           |      '$IdNumRe', '<NUM>', 'g')) AS redacted_md5
           |FROM documents ORDER BY doc_id""".stripMargin
      )
    ),
    // Simpson type-token diversity per doc: 1 − Σc²/n² over whitespace-
    // token counts — a repetition/diversity quality signal (1 − the
    // probability two random tokens coincide). Pure +,·,÷ on BIGINTs —
    // no transcendentals — so the 6dp fixed-point value is bit-exact
    // across engines via the same round-half-up integer division as
    // text_quality. Two two-phase hash aggregates on (doc_id, tok) then
    // doc_id; both shuffles scale with corpus size, never pairs.
    Q(
      "text_diversity",
      (s, d) => {
        val n2 = col("n") * col("n")
        documents(s, d)
          .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(
            sum(col("c")).as("n"),
            sum(col("c") * col("c")).as("q"),
            count(lit(1)).as("n_types")
          )
          .select(
            col("doc_id"),
            col("n").as("n_tokens"),
            col("n_types"),
            (intDiv((n2 - col("q")) * lit(2000000L) + n2, n2 * lit(2L))
              .cast("double") / 1000000.0).as("simpson")
          )
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          |f AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
          |a AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(c*c)::BIGINT AS q,
          |             count(*)::BIGINT AS n_types
          |      FROM f GROUP BY 1)
          |SELECT doc_id, n AS n_tokens, n_types,
          |  (((n*n - q) * 2000000 + n*n) // (2*n*n)) / 1000000.0 AS simpson
          |FROM a ORDER BY doc_id""".stripMargin
      )
    ),
    // TF-IDF keyword extraction: corpus document frequencies + per-doc
    // top-3 terms by tf·ln(N/df). Two hash aggregates (term-frequency,
    // document-frequency), a broadcast of the tiny df/N side at this
    // vocabulary size, one ranking window — each shuffle is on a key
    // that scales with vocabulary or documents, never pairs. ln() is
    // transcendental (not IEEE-reproducible across libms), so ranking
    // compares the 6dp-QUANTIZED score with the term as tiebreaker: a
    // 1-ulp cross-engine ln difference cannot flip rank (and
    // mathematically-equal scores from different (tf, df) pairs
    // quantize identically) — only the same 6dp half-boundary residual
    // the fn_math oracle already accepts remains.
    Q(
      "text_tfidf",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score6").desc, col("term"))
        val toks = documents(s, d)
          .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
        val n = documents(s, d).agg(count(lit(1)).as("n"))
        tf.join(broadcast(df), "term")
          .crossJoin(broadcast(n))
          .withColumn(
            "score6",
            round(col("tf").cast("double") * log(col("n").cast("double") / col("df").cast("double")), 6)
          )
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score6").as("score"))
          .orderBy("doc_id", "term")
      },
      Some(
        """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
          |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
          |n AS (SELECT count(*) AS n FROM documents),
          |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
          |         round(CAST(tf.tf AS DOUBLE)
          |           * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS score6
          |       FROM tf JOIN df USING (term) CROSS JOIN n),
          |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |        ORDER BY score6 DESC, term) AS rn FROM sc)
          |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
          |       score6 AS score
          |FROM r WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin
      )
    ),
    // Perplexity-proxy quality filter (CCNet-style): score each doc by
    // its negative log-likelihood under the corpus's own unigram LM —
    // the standard "drop gibberish / keep fluent text" pretraining
    // gate, honest without a neural LM. Float-sum hazard avoided by
    // construction: the ONE transcendental per term, ln(T/C(w)), is
    // quantized to integer micro-nats (same single-ln + round
    // cross-engine contract text_tfidf relies on), and everything
    // per-doc is exact BIGINT arithmetic — order-free sums, exact
    // threshold compare — so Spark's nondeterministic partial-agg
    // order cannot move a hash bit. The (term → score) table is an
    // aggregate of the token stream (vocabulary-sized): AQE broadcasts
    // the join here; at extreme vocab it degrades to a shuffled join.
    Q(
      "text_quality_lm",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
        val c = toks.groupBy("term").agg(count(lit(1)).as("c"))
        val t = toks.agg(count(lit(1)).as("t"))
        val r = c
          .crossJoin(broadcast(t))
          .select(
            col("term"),
            round(log(col("t").cast("double") / col("c").cast("double")) * lit(1000000.0), 0)
              .cast("long").as("rmicro")
          )
        toks
          .join(r, "term")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("rmicro")).as("nll_micro"))
          .withColumn("keep", col("nll_micro") < lit(3402000L) * col("n_tokens"))
          .orderBy("doc_id")
      },
      Some(
        """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          |c AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
          |t AS (SELECT count(*) AS t FROM toks),
          |r AS (SELECT term,
          |        CAST(round(ln(CAST(t.t AS DOUBLE) / CAST(c.c AS DOUBLE)) * 1000000, 0) AS BIGINT) AS rmicro
          |      FROM c CROSS JOIN t)
          |SELECT toks.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(sum(r.rmicro) AS BIGINT) AS nll_micro,
          |       sum(r.rmicro) < 3402000 * count(*) AS keep
          |FROM toks JOIN r USING (term)
          |GROUP BY toks.doc_id ORDER BY toks.doc_id""".stripMargin
      )
    ),
    // Linear quality-classifier scoring via the hashing trick
    // (Weinberger et al. 2009, the fastText-filter shape CCNet/LLaMA
    // pipelines use to score web docs): each token hashes into one of
    // 4096 feature buckets, the doc's logit is the sum of its buckets'
    // weights. Weights here are deterministic pseudo-weights derived by
    // hashing the bucket id (no trained model ships with the engine —
    // production swaps in a broadcast weight array; the plan is
    // identical). All-integer milli-unit weights ⇒ order-free BIGINT
    // sums, no float hazards. Scale shape: scan → codegen'd explode →
    // two-phase hash agg on doc_id. A doc's tokens never leave their
    // scan partition, so partial aggregation collapses to ONE row per
    // doc map-side — the only shuffle carries the result rows, and the
    // 4096-bucket model is pure expression work (zero memory, zero
    // join) regardless of corpus size.
    Q(
      "text_classifier",
      (s, d) => {
        val bucket =
          conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 4096
        val weight =
          conv(substring(md5(bucket.cast("string")), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000
        documents(s, d)
          .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
          .select(col("doc_id"), weight.as("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("logit_milli"))
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          |h AS (SELECT doc_id,
          |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 4096 AS b
          |      FROM t)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
          |  CAST(sum(CAST(('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
          |       AS BIGINT) AS logit_milli
          |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
      )
    ),
    // Benchmark decontamination: flag training documents sharing any
    // word-K-shingle with a held-out benchmark set (here: every 20th
    // doc stands in for the eval suite; production uses 13-grams of the
    // actual benchmarks). Candidates come from a bucketed equi-join on
    // the shingle — the benchmark side is tiny and broadcastable, the
    // scan side never self-joins — so the op is one shuffle at any
    // scale. Exact overlap counts ⇒ fully oracle-checked.
    Q(
      "text_decontaminate",
      (s, d) => {
        // filter BEFORE the kernel stage: a predicate above the opaque
        // typed flatMap cannot be pushed past it, which would shingle
        // the whole corpus twice; these prune at the parquet scan
        val docs = documents(s, d)
        val bench = shingleRowsOf(s, docs.filter(col("doc_id") % 20 === 0))
          .select(col("doc_id").as("bench_id"), col("shingle"))
        shingleRowsOf(s, docs.filter(col("doc_id") % 20 =!= 0))
          .select("doc_id", "shingle")
          .join(broadcast(bench), "shingle")
          .groupBy("doc_id")
          .agg(
            countDistinct(col("shingle")).as("n_shared"),
            countDistinct(col("bench_id")).as("n_bench")
          )
          .orderBy("doc_id")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id,
           |        unnest(list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
           |          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' ')))) AS shingle
           |      FROM t WHERE len(toks) >= $ShingleK)
           |SELECT tr.doc_id,
           |       count(DISTINCT tr.shingle) AS n_shared,
           |       count(DISTINCT b.doc_id) AS n_bench
           |FROM (SELECT * FROM sh WHERE doc_id % 20 <> 0) tr
           |JOIN (SELECT * FROM sh WHERE doc_id % 20 = 0) b
           |  ON tr.shingle = b.shingle
           |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin
      )
    ),
    // Int8 scalar quantization of the embedding column — the standard
    // compression step before shipping vectors to an ANN index at
    // 100 TB (4× smaller than float32). Per-vector min/max scale, one
    // codegen'd posexplode (no shuffle at all: scan → project →
    // generate), long-form scalar rows so any engine can diff them.
    // Both engines evaluate the identical double expression
    // (float→double casts are exact), so the rounded codes agree.
    Q(
      "embed_quantize",
      (s, d) => {
        val e = embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
          .withColumn("mn", array_min(col("embedding")).cast("double"))
          .withColumn("mx", array_max(col("embedding")).cast("double"))
        e.select(
          col("vec_id"), col("mn"), col("mx"),
          posexplode(col("embedding")).as(Seq("pos", "v"))
        ).select(
          col("vec_id"),
          col("pos").cast("long").as("pos"),
          when(
            col("mx") > col("mn"),
            // gridLong, not a bare cast: a reordered/CSE'd evaluation
            // above the finite filter would see NaN here (NaN > mn is
            // TRUE under Spark's NaN-greatest comparisons) and ANSI
            // would kill the query; post-filter the guard never fires
            Grid.gridLong(
              (col("v").cast("double") - col("mn")) * 254.0 / (col("mx") - col("mn")),
              1.0) - 127L
          ).otherwise(0L).as("q")
        ).orderBy("vec_id", "pos")
      },
      Some(
s"""WITH f AS (SELECT vec_id, ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings),
          |t AS (SELECT vec_id,
          |  CAST(list_min(embedding) AS DOUBLE) AS mn,
          |  CAST(list_max(embedding) AS DOUBLE) AS mx,
          |  unnest(range(0, len(embedding))) AS pos,
          |  unnest(embedding) AS v
          |  FROM f WHERE embedding IS NOT NULL)
          |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
          |  CASE WHEN mx > mn THEN
          |    CAST(round((CAST(v AS DOUBLE) - mn) * 254.0 / (mx - mn)) AS BIGINT) - 127
          |  ELSE 0 END AS q
          |FROM t ORDER BY vec_id, pos""".stripMargin
      )
    ),
    // Lloyd's k-means over the embedding column — the distributed
    // clustering primitive behind IVF index training and SemDeDup cell
    // construction, as honest Spark dataflow: per iteration, assignment
    // is a broadcast of the k=8 centroids against the scan (O(n·k·dim),
    // no shuffle) and the update is a two-phase hash agg over (cell,
    // dim) — k·dim groups, collapsed map-side — rebuilt into centroid
    // arrays. Three iterations unrolled. Cross-engine EXACT by
    // construction: vectors quantize to an integer-micro grid first, so
    // distances are BIGINT sums (no float-order hazards), the argmin
    // tie-breaks on cell id, and the centroid mean is an integer
    // division made floor/trunc-agnostic by a +S offset (operands kept
    // non-negative). Deterministic hash-ranked init (smallest md5 of
    // vec_id). The 8-row row_number window runs on the post-limit rows
    // only — the single-partition window is over k rows, not data.
    Q(
      "embed_kmeans",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val k = 8; val iters = 3; val S = 1000000L
        // clustering/encoding is over OBSERVED vectors — a NULL
        // embedding has no cell/code and would poison the hash-ranked
        // seed draw; excluded on both sides (round-13 NULL campaign)
        val vecs = embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
          .select(
            col("vec_id"),
            // per-component gridLong, not a bare cast: Catalyst may
            // reorder/CSE this projection ABOVE the finite filter
            // (filters and deterministic projections commute in its
            // model), so under ANSI the cast must be individually
            // total — the guard never fires on rows the filter keeps
            transform(col("embedding"), x => Grid.gridLong(x.cast("double"), S.toDouble))
              .as("q")
          )
        val init = vecs
          .select(col("vec_id"), col("q"), md5(col("vec_id").cast("string")).as("h"))
          .orderBy("h", "vec_id")
          .limit(k)
          .withColumn("cell", row_number().over(Window.orderBy("h", "vec_id")))
          .select(col("cell").cast("long").as("cell"), col("q").as("c"))
        // shuffle-free assignment (the embed_pq_encode / annIvfPq
        // pattern, applied here in round 18): the k-row centroid table
        // packs into ONE broadcast row and the argmin folds inside the
        // row via the codegen'd PqArgmin kernel — same BIGINT
        // accumulation order (dim 0..63) and the same ORDER BY d2,
        // cell tie-break as the min(struct(d2, cell)) it replaces.
        // The former crossJoin(k rows) + groupBy(vec_id) shape carried
        // first(q) through the aggregate, whose array-typed buffer
        // forces SortAggregate: each of the 3 assign passes paid a
        // k-fold row explosion, TWO corpus sorts and a corpus-wide
        // hashpartitioning(vec_id) exchange. Now assign is a narrow
        // projection — zero exchanges, zero sorts at any corpus size.
        def assign(cents: DataFrame): DataFrame = {
          val packed =
            cents.agg(sort_array(collect_list(struct(col("cell"), col("c")))).as("cbs"))
          vecs
            .crossJoin(broadcast(packed))
            .withColumn("best", VectorKernels.pqArgmin(col("q"), col("cbs")))
            .select(
              col("vec_id"), col("best.cell").as("cell"), col("best.d2").as("d2"), col("q"))
        }
        def update(assigned: DataFrame): DataFrame =
          assigned
            .select(col("cell"), posexplode(col("q")).as(Seq("dim", "v")))
            .groupBy("cell", "dim")
            .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
            // floor/trunc-agnostic integer mean: numerator kept >= 0
            .withColumn("avg", intDiv(col("sv") + col("n") * S, col("n")) - S)
            .groupBy("cell")
            .agg(
              transform(
                sort_array(collect_list(struct(col("dim"), col("avg")))),
                e => e.getField("avg")
              ).as("c")
            )
        var cents = init
        var assigned = assign(cents)
        for (_ <- 2 to iters) {
          cents = update(assigned)
          assigned = assign(cents)
        }
        assigned.select(col("vec_id"), col("cell"), col("d2")).orderBy("vec_id")
      },
      Some(
        s"""WITH v AS (SELECT vec_id,
          |    list_transform(embedding,
          |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
          |  FROM (SELECT vec_id, ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings)
          |  WHERE embedding IS NOT NULL),
          |init AS (SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS cell, q AS c
          |         FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
          |p1 AS (SELECT v.vec_id, v.q, i.cell,
          |    CAST(list_sum(list_transform(range(1, 65),
          |      j -> (v.q[j] - i.c[j]) * (v.q[j] - i.c[j]))) AS BIGINT) AS d2
          |  FROM v CROSS JOIN init i),
          |a1 AS (SELECT vec_id, q, cell, d2 FROM
          |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM p1)
          |  WHERE rn = 1),
          |e1 AS (SELECT cell, unnest(range(1, 65)) AS dim, unnest(q) AS val FROM a1),
          |s1 AS (SELECT cell, dim, CAST(sum(val) AS BIGINT) AS sv, count(*) AS n
          |       FROM e1 GROUP BY 1, 2),
          |c1 AS (SELECT cell, list((sv + n * 1000000) // n - 1000000 ORDER BY dim) AS c
          |       FROM s1 GROUP BY cell),
          |p2 AS (SELECT v.vec_id, v.q, i.cell,
          |    CAST(list_sum(list_transform(range(1, 65),
          |      j -> (v.q[j] - i.c[j]) * (v.q[j] - i.c[j]))) AS BIGINT) AS d2
          |  FROM v CROSS JOIN c1 i),
          |a2 AS (SELECT vec_id, q, cell, d2 FROM
          |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM p2)
          |  WHERE rn = 1),
          |e2 AS (SELECT cell, unnest(range(1, 65)) AS dim, unnest(q) AS val FROM a2),
          |s2 AS (SELECT cell, dim, CAST(sum(val) AS BIGINT) AS sv, count(*) AS n
          |       FROM e2 GROUP BY 1, 2),
          |c2 AS (SELECT cell, list((sv + n * 1000000) // n - 1000000 ORDER BY dim) AS c
          |       FROM s2 GROUP BY cell),
          |p3 AS (SELECT v.vec_id, v.q, i.cell,
          |    CAST(list_sum(list_transform(range(1, 65),
          |      j -> (v.q[j] - i.c[j]) * (v.q[j] - i.c[j]))) AS BIGINT) AS d2
          |  FROM v CROSS JOIN c2 i),
          |a3 AS (SELECT vec_id, cell, d2 FROM
          |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM p3)
          |  WHERE rn = 1)
          |SELECT vec_id, cell, d2 FROM a3 ORDER BY vec_id""".stripMargin
      )
    ),
    // Product quantization (PQ) encode — the compression step behind
    // IVF-PQ indexes at 100 TB scale: split each 64-dim vector into
    // m=4 subspaces of 16 dims, train a tiny k=4 codebook per subspace
    // (2 Lloyd iterations), and emit each vector's per-subspace code +
    // residual distortion. 64 floats become 4 small codes (plus the
    // shared 16-row codebook), the memory shape ANN indexes ship.
    // Spark-first: all m subspaces train in ONE dataflow — vectors
    // explode to (vec, sub, subvector) rows, assignment is a broadcast
    // join against the m·k=16-row codebook, the update is a two-phase
    // hash agg over (sub, cell, dim) = 256 groups (map-side collapsed,
    // reduce side codebook-sized at any corpus scale). No per-subspace
    // driver loop over data. Cross-engine EXACT via the embed_kmeans
    // discipline: integer-micro grid (BIGINT d2 sums, no float-order
    // hazards), argmin ties on cell id, floor/trunc-agnostic integer
    // centroid means, shared hash-ranked seed draw (subspace s of seed
    // r initializes codebook row r of subspace s).
    Q(
      "embed_pq_encode",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val m = 4L; val sd = 16; val k = 4; val S = 1000000L
        // clustering/encoding is over OBSERVED vectors — a NULL
        // embedding has no cell/code and would poison the hash-ranked
        // seed draw; excluded on both sides (round-13 NULL campaign)
        val vecs = embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
          .select(
            col("vec_id"),
            // per-component gridLong, not a bare cast: Catalyst may
            // reorder/CSE this projection ABOVE the finite filter
            // (filters and deterministic projections commute in its
            // model), so under ANSI the cast must be individually
            // total — the guard never fires on rows the filter keeps
            transform(col("embedding"), x => Grid.gridLong(x.cast("double"), S.toDouble))
              .as("q")
          )
        val seeds = vecs
          .select(col("vec_id"), col("q"), md5(col("vec_id").cast("string")).as("h"))
          .orderBy("h", "vec_id")
          .limit(k)
          .withColumn("cell", row_number().over(Window.orderBy("h", "vec_id")).cast("long"))
        // the k-row seed window above runs on post-limit rows only
        def subvec(q: Column, sub: Column): Column =
          slice(q, (sub * sd + 1).cast("int"), lit(sd))
        val i0 = seeds
          .select(col("cell"), explode(sequence(lit(0L), lit(m - 1))).as("sub"), col("q"))
          .select(col("sub"), col("cell"), subvec(col("q"), col("sub")).as("c"))
        val sv = vecs
          .select(col("vec_id"), explode(sequence(lit(0L), lit(m - 1))).as("sub"), col("q"))
          .select(col("vec_id"), col("sub"), subvec(col("q"), col("sub")).as("sq"))
        // shuffle-free assignment: the k-entry per-subspace codebook
        // packs into ONE broadcast row and the argmin folds inside the
        // row (strict < over the cell-sorted list = the oracle's ORDER
        // BY d2, cell tie-break) — no k-way row explosion, no
        // subvector-carrying groupBy exchange (see annIvfPq)
        def assign(cb: DataFrame): DataFrame = {
          val packed = cb.groupBy("sub")
            .agg(sort_array(collect_list(struct(col("cell"), col("c")))).as("cbs"))
          sv.join(broadcast(packed), "sub")
            // native codegen'd integer argmin over the cell-sorted
            // packed codebook — BIGINT accumulation and the ORDER BY
            // d2, cell tie-break exactly as the oracle's row_number
            .withColumn("best", VectorKernels.pqArgmin(col("sq"), col("cbs")))
            .select(
              col("vec_id"), col("sub"),
              col("best.cell").as("cell"), col("best.d2").as("d2"), col("sq"))
        }
        def update(a: DataFrame): DataFrame =
          a.select(col("sub"), col("cell"), posexplode(col("sq")).as(Seq("dim", "v")))
            .groupBy("sub", "cell", "dim")
            .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
            .withColumn("avg", intDiv(col("sv") + col("n") * S, col("n")) - S)
            .groupBy("sub", "cell")
            .agg(
              transform(
                sort_array(collect_list(struct(col("dim"), col("avg")))),
                e => e.getField("avg")
              ).as("c")
            )
        val a2 = assign(update(assign(i0)))
        a2.select(col("vec_id"), col("sub"), col("cell").as("code"), col("d2"))
          .orderBy("vec_id", "sub")
      },
      Some(
        s"""WITH v AS (SELECT vec_id,
          |    list_transform(embedding,
          |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
          |  FROM (SELECT vec_id, ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings)
          |  WHERE embedding IS NOT NULL),
          |g AS (SELECT unnest(range(0, 4)) AS sub),
          |sv AS (SELECT vec_id, sub,
          |    list_transform(range(1, 17), j -> q[sub*16 + j]) AS sq FROM v, g),
          |seeds AS (SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS cell, q
          |          FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
          |i0 AS (SELECT sub, cell,
          |    list_transform(range(1, 17), j -> q[sub*16 + j]) AS c FROM seeds, g),
          |p1 AS (SELECT t.vec_id, t.sub, i.cell, t.sq,
          |    CAST(list_sum(list_transform(range(1, 17),
          |      j -> (t.sq[j] - i.c[j]) * (t.sq[j] - i.c[j]))) AS BIGINT) AS d2
          |  FROM sv t JOIN i0 i ON t.sub = i.sub),
          |a1 AS (SELECT vec_id, sub, cell, d2, sq FROM
          |  (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) AS rn FROM p1)
          |  WHERE rn = 1),
          |e1 AS (SELECT sub, cell, unnest(range(1, 17)) AS dim, unnest(sq) AS val FROM a1),
          |s1 AS (SELECT sub, cell, dim, CAST(sum(val) AS BIGINT) AS sv_, count(*) AS n
          |       FROM e1 GROUP BY 1, 2, 3),
          |c1 AS (SELECT sub, cell, list((sv_ + n * 1000000) // n - 1000000 ORDER BY dim) AS c
          |       FROM s1 GROUP BY sub, cell),
          |p2 AS (SELECT t.vec_id, t.sub, i.cell,
          |    CAST(list_sum(list_transform(range(1, 17),
          |      j -> (t.sq[j] - i.c[j]) * (t.sq[j] - i.c[j]))) AS BIGINT) AS d2
          |  FROM sv t JOIN c1 i ON t.sub = i.sub),
          |a2 AS (SELECT vec_id, sub, cell, d2 FROM
          |  (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) AS rn FROM p2)
          |  WHERE rn = 1)
          |SELECT vec_id, CAST(sub AS BIGINT) AS sub, cell AS code, d2
          |FROM a2 ORDER BY vec_id, sub""".stripMargin
      )
    ),
    // Text canonicalization — the first pass of every training-data
    // pipeline (case-fold, strip non-alphanumerics, collapse runs of
    // whitespace) so downstream dedup/fingerprint keys are stable
    // across formatting variants. Pure scan->project, fully codegen'd,
    // zero shuffles (the ORDER BY is the oracle determinism edge).
    // Cross-engine note: Java regex walks UTF-16 units, RE2 walks
    // codepoints — identical on BMP text (this corpus is ASCII); astral
    // chars would count differently and need a codepoint-safe kernel.
    Q(
      "text_normalize",
      (s, d) => {
        val norm = trim(
          regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
            " +",
            " "
          )
        )
        documents(s, d)
          .select(col("doc_id"), norm.as("norm_text"))
          .withColumn(
            "n_tok",
            when(col("norm_text") === "", 0L)
              .otherwise(size(split(col("norm_text"), " ")).cast("long"))
          )
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          |       ' +', ' ', 'g')) AS norm_text,
          |  CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          |       ' +', ' ', 'g')) = '' THEN 0
          |  ELSE CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
          |       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) END AS n_tok
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ),
    // Quality-weighted corpus sampling — keep each document with
    // probability equal to its quality score, the importance-sampling
    // step that upweights clean text in a mixed crawl. Deterministic
    // and cluster-reproducible: the acceptance draw is a cryptographic
    // hash of doc_id (uniform in [0, 1e6)), compared against the
    // integer-ppm quality score, so membership is a pure function of
    // the row — no RNG state, identical on any partitioning, and both
    // engines evaluate the identical integer comparison. Scan ->
    // filter, no shuffle; the ppm threshold reuses qualityScore's
    // integer grid (ppm/1e6 is exact in double, so round recovers the
    // integer exactly).
    Q(
      "sample_quality_weighted",
      (s, d) => {
        val bucket =
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000000L
        documents(s, d)
          .withColumn("quality", qualityScore(col("text")))
          .withColumn("bucket", bucket)
          .filter(col("bucket") < round(col("quality") * 1000000.0, 0).cast("long"))
          .select(col("doc_id"), col("lang"), col("quality"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, lang,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
          |  CAST(length(text) AS BIGINT) AS c,
          |  CAST(len(list_filter(string_split(text, ' '),
          |       w -> w IN ('the','a','of','and','to','in','is','that'))) AS BIGINT) AS s,
          |  CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS BIGINT) AS a,
          |  CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 1000000 AS bucket
          |  FROM documents),
          |q AS (SELECT doc_id, lang, bucket,
          |  CASE WHEN c = 0 THEN NULL ELSE
          |  ((CAST(40*s*c + 3*least((c-n+1)*c, 10*n*c) + 30*a*n AS HUGEINT) * 2000000 + 100*n*c)
          |    // (2*100*n*c)) END AS k
          |  FROM t)
          |SELECT doc_id, lang, k / 1000000.0 AS quality, bucket
          |FROM q WHERE bucket < k ORDER BY doc_id""".stripMargin
      )
    ),
    // Per-dimension embedding distribution statistics — the feature-
    // health scan run before training an IVF/PQ index or whitening
    // transform (dead dims, scale outliers, centering constants).
    // Vectors quantize to the integer-micro grid up front (the
    // embed_kmeans trick), so every aggregate is a BIGINT sum — no
    // float summation-order hazards — and mean/std reconstruct from
    // (n, sum, sum-of-squares) with an identical double expression tree
    // in both engines. One generate (64x expand) into one two-phase
    // hash agg over 64 groups, collapsed map-side: the reduce side is
    // dimension-sized at any corpus scale. Grid headroom: |x|<=1 puts
    // sum(v^2) per dim under 1e12 per row — BIGINT holds ~9e6 rows per
    // dim; beyond that, coarsen the grid or widen to DECIMAL.
    Q(
      "embed_stats",
      (s, d) => {
        embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
          .select(
            posexplode(
              transform(
                col("embedding"),
                x => Grid.gridLong(x.cast("double"), 1000000.0)
              )
            ).as(Seq("dim", "v"))
          )
          .groupBy(col("dim").cast("long").as("dim"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("v")).as("sv"),
            sum(col("v") * col("v")).as("sq"),
            min(col("v")).as("mn"),
            max(col("v")).as("mx")
          )
          .select(
            col("dim"),
            col("n"),
            round(col("sv").cast("double") / col("n") / 1000000.0, 6).as("mean"),
            round(
              sqrt(
                greatest(
                  (col("sq").cast("double") -
                    col("sv").cast("double") * col("sv").cast("double") / col("n")) / col("n"),
                  lit(0.0)
                )
              ) / 1000000.0,
              6
            ).as("std"),
            round(col("mn") / 1000000.0, 6).as("vmin"),
            round(col("mx") / 1000000.0, 6).as("vmax")
          )
          .orderBy("dim")
      },
      Some(
s"""WITH f AS (SELECT ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings),
          |t AS (SELECT
          |    unnest(range(0, len(embedding))) AS dim,
          |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v
          |  FROM f WHERE embedding IS NOT NULL),
          |a AS (SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
          |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v*v) AS BIGINT) AS sq,
          |    min(v) AS mn, max(v) AS mx
          |  FROM t GROUP BY 1)
          |SELECT dim, n,
          |  round(CAST(sv AS DOUBLE) / n / 1000000.0, 6) AS mean,
          |  round(sqrt(greatest((CAST(sq AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / n,
          |        0)) / 1000000.0, 6) AS std,
          |  round(mn / 1000000.0, 6) AS vmin,
          |  round(mx / 1000000.0, 6) AS vmax
          |FROM a ORDER BY dim""".stripMargin
      )
    ),
    // Top principal component of the embedding cloud — the whitening /
    // drift-detection primitive (which direction dominates the
    // corpus's variance). Distributed shape: ONE pass builds the d x d
    // Gram matrix of centered vectors as a two-phase hash agg over
    // (i, j) pairs — the 64x64=4096-group reduce side is
    // dimension-sized at any corpus scale, and everything downstream
    // (3 power-iteration steps) runs on 64-row metadata. Cross-engine
    // EXACT by construction, the embed_kmeans discipline end to end:
    // vectors quantize to the integer-micro grid, the mean and the
    // Gram rescale are offset-guarded integer divisions, and each
    // power step renormalizes to an integer [-1000, 1000] grid by
    // dividing through max|w| — no float summation anywhere, so the
    // DuckDB oracle replays the identical integers through 3 unrolled
    // CTE iterations. Grid headroom: |gsum| <= 4e12 * n_vectors must
    // stay under the 1e17 offset — raise GS/OFF together past ~2.5e4
    // vectors (the corpus-scale path samples or sketches the Gram
    // anyway; the power loop itself never sees corpus-sized data).
    Q(
      "embed_pca",
      (s, d) => {
        val S = 1000000L // quantize grid
        val OFF = 100000000000000000L // Gram division offset (multiple of GS)
        val GS = 1000000L // Gram rescale divisor
        val VG = 1000L // iteration-vector grid
        val KOFF = 2000L // iteration division offset (> VG)
        // clustering/encoding is over OBSERVED vectors — a NULL
        // embedding has no cell/code and would poison the hash-ranked
        // seed draw; excluded on both sides (round-13 NULL campaign)
        val vecs = embeddings(s, d)
          .filter(Grid.isFiniteVec(col("embedding")))
          .select(
            col("vec_id"),
            // per-component gridLong, not a bare cast: Catalyst may
            // reorder/CSE this projection ABOVE the finite filter
            // (filters and deterministic projections commute in its
            // model), so under ANSI the cast must be individually
            // total — the guard never fires on rows the filter keeps
            transform(col("embedding"), x => Grid.gridLong(x.cast("double"), S.toDouble))
              .as("q")
          )
        val mArr = vecs
          .select(posexplode(col("q")).as(Seq("dim", "v")))
          .groupBy("dim")
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
          .withColumn("mq", intDiv(col("sv") + col("n") * S, col("n")) - S)
          .groupBy()
          .agg(
            transform(
              sort_array(collect_list(struct(col("dim"), col("mq")))),
              _.getField("mq")
            ).as("m")
          )
        val centered = vecs
          .crossJoin(broadcast(mArr))
          .select(zip_with(col("q"), col("m"), (a, b) => a - b).as("cq"))
        // one-pass Gram via the typed GramAggregator: each partition
        // folds into a single 64x64 long buffer, partials merge by add
        // — no n·d² row explosion (the transform×transform + explode +
        // groupBy(i,j) it replaces generated 4096 interpreted-lambda
        // struct rows PER VECTOR); BIGINT sums identical, oracle
        // untouched. The flat result unpacks to the same (i, garr) rows.
        val grow = {
          val sp = s
          import sp.implicits._
          // a GLOBAL typed aggregation emits its zero buffer even over
          // EMPTY input — a 64x64 all-zero Gram that would fabricate 64
          // loadings from no data (the oracle's FROM-joins propagate
          // emptiness instead). The one-row marker keeps the pipelines
          // agreeing: no vectors, no Gram rows.
          val nz = vecs.limit(1).select(lit(1).as("__nz"))
          centered
            .select(col("cq"))
            .as[Array[Long]]
            .select(new graft.functions.GramAggregator(EmbedDim).toColumn.name("gram"))
            .toDF("gram")
            .select(posexplode(col("gram")).as(Seq("idx", "gsum")))
            .select(
              (col("idx") / EmbedDim).cast("int").as("i"),
              (col("idx") % EmbedDim).cast("int").as("j"),
              col("gsum"))
            .withColumn("g", intDiv(col("gsum") + OFF, lit(GS)) - OFF / GS)
            .groupBy("i")
            .agg(
              transform(
                sort_array(collect_list(struct(col("j"), col("g")))),
                _.getField("g")
              ).as("garr")
            )
            .crossJoin(broadcast(nz))
            .drop("__nz")
            // the Gram is DIMENSION-sized (64 rows) but referenced by
            // every power step — uncached, Catalyst copies its whole
            // corpus-sized pipeline into each of the nine references
            // (the round-17 plan counted 42 parquet scans for this
            // query). One cached compute; rebuilt from parquet on every
            // invocation (intra-query reuse, not cross-run state).
            .cache()
        }
        val stepCaches = scala.collection.mutable.ListBuffer.empty[DataFrame]
        def step(vRow: DataFrame): DataFrame = {
          // w is 64 rows, referenced twice (its own max-abs scalar and
          // the renormalize join) — cache for the same reason as grow
          val w = grow
            .crossJoin(broadcast(vRow))
            .select(
              col("i"),
              aggregate(
                zip_with(col("garr"), col("varr"), (a, b) => a * b),
                lit(0L),
                (acc, x) => acc + x
              ).as("w")
            )
            .cache()
          stepCaches += w
          val wm = w.agg(greatest(max(abs(col("w"))), lit(1L)).as("wm"))
          w.crossJoin(broadcast(wm))
            .withColumn(
              "vq",
              intDiv(col("w") * VG + col("wm") * KOFF, col("wm")) - KOFF
            )
        }
        def toRow(withVq: DataFrame): DataFrame =
          withVq
            .groupBy()
            .agg(
              transform(
                sort_array(collect_list(struct(col("i"), col("vq")))),
                _.getField("vq")
              ).as("varr")
            )
        val v0 = s.range(1).select(array_repeat(lit(VG), EmbedDim).as("varr"))
        val it3 = step(toRow(step(toRow(step(v0)))))
        // all four dimension-sized caches (Gram + the three power-step
        // w frames) stay live for THIS plan; the next invocation's
        // registration evicts them (CacheTracker)
        CacheTracker.track("embed_pca", (grow +: stepCaches.toSeq): _*)
        it3
          .select(col("i").cast("long").as("dim"), (col("vq") / 1000.0).as("loading"))
          .orderBy("dim")
      },
      Some(
        s"""WITH v AS (SELECT vec_id,
          |    list_transform(embedding,
          |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
          |  FROM (SELECT vec_id, ${Grid.finiteVecSql("embedding")} AS embedding FROM embeddings)
          |  WHERE embedding IS NOT NULL),
          |mm AS (SELECT dim,
          |    (CAST(sum(val) AS BIGINT) + count(*) * 1000000) // count(*) - 1000000 AS mq
          |  FROM (SELECT unnest(range(1, 65)) AS dim, unnest(q) AS val FROM v)
          |  GROUP BY dim),
          |ma AS (SELECT list(mq ORDER BY dim) AS m FROM mm),
          |c AS (SELECT list_transform(range(1, 65), j -> v.q[j] - ma.m[j]) AS cq
          |      FROM v, ma),
          |gp AS (SELECT i, j, CAST(sum(cq[i] * cq[j]) AS BIGINT) AS gsum
          |  FROM c,
          |    (SELECT unnest(range(1, 65)) AS i) ri,
          |    (SELECT unnest(range(1, 65)) AS j) rj
          |  GROUP BY i, j),
          |gr AS (SELECT i,
          |    list((gsum + 100000000000000000) // 1000000 - 100000000000 ORDER BY j) AS garr
          |  FROM gp GROUP BY i),
          |w1 AS (SELECT i, CAST(list_sum(list_transform(garr, g -> g * 1000)) AS BIGINT) AS w
          |       FROM gr),
          |m1 AS (SELECT greatest(max(abs(w)), 1) AS wm FROM w1),
          |v1 AS (SELECT list((w * 1000 + wm * 2000) // wm - 2000 ORDER BY i) AS varr
          |       FROM w1, m1),
          |w2 AS (SELECT i, CAST(list_sum(list_transform(range(1, 65),
          |         j -> garr[j] * varr[j])) AS BIGINT) AS w
          |       FROM gr, v1),
          |m2 AS (SELECT greatest(max(abs(w)), 1) AS wm FROM w2),
          |v2 AS (SELECT list((w * 1000 + wm * 2000) // wm - 2000 ORDER BY i) AS varr
          |       FROM w2, m2),
          |w3 AS (SELECT i, CAST(list_sum(list_transform(range(1, 65),
          |         j -> garr[j] * varr[j])) AS BIGINT) AS w
          |       FROM gr, v2),
          |m3 AS (SELECT greatest(max(abs(w)), 1) AS wm FROM w3),
          |v3 AS (SELECT i, (w * 1000 + wm * 2000) // wm - 2000 AS vq FROM w3, m3)
          |SELECT CAST(i - 1 AS BIGINT) AS dim, vq / 1000.0 AS loading
          |FROM v3 ORDER BY dim""".stripMargin
      )
    )
  )
}
