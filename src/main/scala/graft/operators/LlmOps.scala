package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
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

  private val ShingleK = 3
  private val MinhashPerms = 64
  private val Bands = 8
  private val RowsPerBand = 8
  private val JaccardThreshold = 0.8
  private val CosineDupThreshold = 0.45 // corpus max pairwise cosine ≈ 0.51

  /** docs with non-empty distinct 3-word shingle sets. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), shingles(col("text"), ShingleK).as("sh"))
      .filter(size(col("sh")) > 0)

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
            size(reTokens(col("text"))).cast("long").as("n_re"),
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
        """SELECT doc_id,
          |  round(
          |    0.4 * (len(list_filter(string_split(text, ' '),
          |            t -> t IN ('the','a','of','and','to','in','is','that')))::DOUBLE
          |           / len(string_split(text, ' ')))
          |  + 0.3 * least(((length(text)::DOUBLE - (len(string_split(text, ' ')) - 1))
          |                 / len(string_split(text, ' '))) / 10, 1.0)
          |  + 0.3 * (length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE
          |           / length(text)), 6) AS quality
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ),
    // Document fingerprints: whole-doc md5 + min shingle-hash (1-perm
    // MinHash with a cryptographic hash both engines share).
    Q(
      "text_fingerprint",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            md5(col("text")).as("fp_doc"),
            array_min(transform(shingles(col("text"), ShingleK), sh => md5(sh)))
              .as("fp_shingle")
          )
          .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
           |SELECT doc_id, md5(text) AS fp_doc,
           |  list_aggregate(
           |    list_transform(
           |      list_distinct(list_transform(range(1, len(toks) - 1),
           |        i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))),
           |      s -> md5(s)), 'min') AS fp_shingle
           |FROM t ORDER BY doc_id""".stripMargin
      )
    ),
    // Language-ID heuristic — stopword-profile scoring (no SQL oracle;
    // rows-only check).
    Q(
      "text_langid",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"), langId(col("text")).as("lang_pred"), col("lang"))
          .orderBy("doc_id"),
      None
    ),
    // ---- dedup ---------------------------------------------------------
    // MinHash + LSH near-dup pairs: signature → band keys → bucket
    // equi-join candidates → exact-Jaccard verify. Approximate candidate
    // recall ⇒ no SQL oracle (rows-only); exactness of survivors is
    // cross-checked by dedup_ngram.
    Q(
      "dedup_minhash",
      (s, d) => {
        val base = shingled(s, d)
        val withSig = base.withColumn("sig", minhashSignature(col("sh"), MinhashPerms))
        val bandsDf = withSig.select(
          col("doc_id"),
          explode(bandKeys(col("sig"), Bands, RowsPerBand)).as("bkey")
        )
        val cand = bandsDf
          .as("x")
          .join(
            bandsDf.as("y"),
            col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id")
          )
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val est = {
          val eq = zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int"))
          aggregate(eq, lit(0), (acc, v) => acc + v).cast("double") / MinhashPerms
        }
        cand
          .join(withSig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("sig").as("sig_a")), "doc_a")
          .join(withSig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("sig").as("sig_b")), "doc_b")
          .select(
            col("doc_a"), col("doc_b"),
            round(est, 6).as("est_jaccard"),
            round(jaccard(col("sh_a"), col("sh_b")), 6).as("jacc")
          )
          .filter(col("jacc") >= JaccardThreshold)
          .orderBy("doc_a", "doc_b")
      },
      None
    ),
    // SimHash near-dup pairs: 64-bit signature, 4×16-bit band keys
    // (pigeonhole: Hamming ≤ 3 ⇒ some band equal), verify bit_count(xor).
    Q(
      "dedup_simhash",
      (s, d) => {
        val base = documents(s, d)
          .select(col("doc_id"), simhash64(reTokens(col("text"))).as("sig"))
        val chunks = base.select(
          col("doc_id"), col("sig"),
          explode(array((0 until 4).map { c =>
            struct(lit(c).as("c"), shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
          }: _*)).as("chunk")
        )
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
    // Exact n-gram (3-word shingle) Jaccard near-dup pairs. Candidate
    // generation by shared-shingle inverted index is COMPLETE for any
    // threshold > 0 (a pair with Jaccard ≥ τ shares ≥ 1 shingle), so an
    // exact SQL oracle applies. At 100 TB you'd add prefix filtering to
    // trim the candidate explosion from frequent shingles.
    Q(
      "dedup_ngram",
      (s, d) => {
        val base = shingled(s, d)
        val inv = base.select(col("doc_id"), explode(col("sh")).as("shingle"))
        val cand = inv
          .as("x")
          .join(
            inv.as("y"),
            col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id")
          )
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
          .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jacc"))
          .filter(col("jacc") >= JaccardThreshold)
          .orderBy("doc_a", "doc_b")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |s AS (SELECT doc_id,
           |        list_distinct(list_transform(range(1, len(toks) - 1),
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
    // Embedding cosine near-dup pairs — exact pairwise (oracle-checked).
    // The scalable path for this op is the LSH/IVF bucketing in
    // sim_ann_ivf; this exact variant is the correctness baseline.
    Q(
      "dedup_embedding",
      (s, d) => {
        val e = embeddings(s, d)
        val a = e.select(col("vec_id").as("id_a"), toDouble(col("embedding")).as("emb_a"))
        val b = e.select(col("vec_id").as("id_b"), toDouble(col("embedding")).as("emb_b"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
          .filter(col("cos") >= CosineDupThreshold)
          .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
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
    // ---- similarity search --------------------------------------------
    // Brute-force cosine top-k vs a probe vector (vec_id 0) — the exact
    // baseline every ANN variant is measured against.
    Q(
      "sim_cosine_topk",
      (s, d) => {
        val e = embeddings(s, d)
        val probe = e.filter(col("vec_id") === 0)
          .select(toDouble(col("embedding")).as("probe"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id"),
            round(cosine(toDouble(col("embedding")), col("probe")), 6).as("score")
          )
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10)
      },
      Some(
        """WITH p AS (SELECT CAST(embedding AS DOUBLE[]) AS probe
          |           FROM embeddings WHERE vec_id = 0)
          |SELECT e.vec_id,
          |       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe), 6) AS score
          |FROM embeddings e, p WHERE e.vec_id <> 0
          |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
      )
    ),
    // IVF approximate nearest neighbors: coarse-quantize to deterministic
    // centroids (every 25th vector), probe the 4 nearest clusters, exact
    // cosine only within candidates. At 100 TB the assignment is a
    // broadcast join on a small centroid table and the probe touches a
    // bounded fraction of partitions. Approximate ⇒ rows-only check.
    Q(
      "sim_ann_ivf",
      (s, d) => {
        val e = embeddings(s, d).withColumn("emb", toDouble(col("embedding")))
        val cents = e.filter(col("vec_id") % 25 === 0)
          .select(col("vec_id").as("cid"), col("emb").as("cemb"))
        val assigned = e
          .crossJoin(broadcast(cents))
          .withColumn("csim", cosine(col("emb"), col("cemb")))
          .groupBy("vec_id")
          .agg(max(struct(col("csim"), col("cid"))).getField("cid").as("cluster"))
        val probe = e.filter(col("vec_id") === 0).select(col("emb").as("probe"))
        val probeClusters = cents
          .crossJoin(broadcast(probe))
          .orderBy(cosine(col("cemb"), col("probe")).desc, col("cid"))
          .limit(4)
          .select(col("cid").as("cluster"))
        e.join(assigned, "vec_id")
          .join(broadcast(probeClusters), "cluster")
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id"), col("cluster"),
            round(cosine(col("emb"), col("probe")), 6).as("score")
          )
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10)
      },
      None
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
    // Decode / feature-extract plumbing for binary media columns via
    // typed mapPartitions (the batch-iterator shape a real decoder
    // needs). The decode itself is a STUB: this container has no image/
    // audio codecs, so a deterministic fake (byte-histogram "features",
    // fixed "frame" sampling) stands in — the schema, partitioning and
    // batch shape are the real thing.
    Q(
      "multimodal_features",
      (s, d) => {
        val sp = s
        import sp.implicits._
        val blobs = documents(s, d)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
          .as[(Long, Array[Byte])]
        blobs
          .mapPartitions { it =>
            it.map { case (id, bytes) =>
              // STUB decode: real impl would decode image/audio here.
              // Deterministic fake: 8 coarse byte-histogram channels.
              val feats = new Array[Float](8)
              var i = 0
              while (i < bytes.length) {
                feats((bytes(i) & 0xFF) / 32) += 1.0f
                i += 1
              }
              val n = math.max(1, bytes.length)
              var j = 0
              while (j < 8) { feats(j) = feats(j) / n; j += 1 }
              val nFrames = (bytes.length / 64) + 1 // fake frame sampling
              (id, feats.toSeq, nFrames)
            }
          }
          .toDF("doc_id", "features", "n_frames")
          .orderBy("doc_id")
      },
      None
    )
  )
}
