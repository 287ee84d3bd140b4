package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Invalid item key (reference: ItemKeyError, oakstore/store.py:45-46). */
class ItemKeyError(msg: String) extends IllegalArgumentException(msg)

/** Schema conflict or normalization failure (reference: SchemaError,
  * oakstore/store.py:41-42).
  */
class SchemaError(msg: String) extends IllegalArgumentException(msg)

/** Item already exists on initial write (reference raises ValueError,
  * oakstore/store.py:203-204).
  */
class ItemExistsError(msg: String) extends IllegalArgumentException(msg)

/** The item has pending crash-recovery markers in `.staging` — mutations
  * are refused until [[Store!.vacuum]] finishes the interrupted op. A
  * distinct type from [[ItemExistsError]] so an upsert-style
  * `catch ItemExistsError → append` caller never converts
  * "run vacuum() first" into an append attempt.
  */
class PendingRecoveryError(msg: String) extends IllegalStateException(msg)

object Store {

  /** Reference key charset: `^[-a-zA-Z0-9_.]+\Z` (oakstore/store.py:28). */
  val KeyRegex = "^[-a-zA-Z0-9_.]+$".r

  /** Default OHLCV schema (oakstore/store.py:19-26): float OHLC + int
    * VOLUME, datetime index DATE.
    */
  val DefaultIndex = "DATE"
  val DefaultColumns: Seq[(String, DataType)] = Seq(
    "OPEN" -> DoubleType,
    "HIGH" -> DoubleType,
    "LOW" -> DoubleType,
    "CLOSE" -> DoubleType,
    "VOLUME" -> LongType
  )

  /** Earliest default query bound — pandas' minimum representable year
    * (oakstore/store.py:250-251 uses datetime(1678, 1, 1)).
    */
  val MinStart: Timestamp = Timestamp.valueOf("1678-01-01 00:00:00")

  /** Metadata-only item statistics (see [[Store.describe]]). */
  /** One retained version of a versioned item (see
    * [[Store!.versionsOf]]).
    */
  case class ItemVersion(
      id: String,
      current: Boolean,
      files: Long,
      bytes: Long,
      modifiedMs: Long
  )

  case class ItemStats(
      rows: Long,
      minIndex: Option[Timestamp],
      maxIndex: Option[Timestamp],
      files: Long,
      bytes: Long
  )

  /** Footer-aggregate answers for the DSv2 aggregate/limit pushdown —
    * see [[Store!.footerAgg]]. `nonNullCounts` carries only columns
    * whose null counts are exact across every row group.
    * `minMaxExactCols` are the integer-family columns (timestamp/date/
    * long/int — fixed-width physical types, whose footer stats are
    * never truncated and cannot be NaN-compromised) whose min/max is
    * provably exact across every row-bearing group; `colMinMax` holds
    * their values widened to Long (µs for timestamps, days for dates) —
    * an exact column ABSENT from the map is provably all-null (SQL
    * min/max → NULL).
    */
  private[graft] case class FooterAgg(
      files: Seq[(String, Long)],
      rows: Long,
      nonNullCounts: Map[String, Long],
      colMinMax: Map[String, (Long, Long)],
      minMaxExactCols: Set[String]
  )

  /** One file's footer statistics, named (round-13 review: this rode
    * through two source files as a positional 6-tuple). A column in
    * `nullCountOkCols` has an exact `nonNullByCol` entry; a column in
    * `minMaxOkCols` has exact `minMaxByCol` bounds OR is provably
    * all-null (then absent from the map).
    */
  private[graft] final case class FileFooterStats(
      path: String,
      rows: Long,
      nonNullByCol: Map[String, Long],
      nullCountOkCols: Set[String],
      minMaxByCol: Map[String, (Long, Long)],
      minMaxOkCols: Set[String])

  /** Order-preserving (signed-long) encoding of a non-NaN double —
    * Lucene's sortableDoubleBits shape: negatives flip mantissa and
    * exponent so signed-long comparison matches IEEE order; the
    * function is its own inverse. Footer double/float min/max travel
    * through the engine's (Long, Long) stat plumbing in this encoding
    * (min/max merging across files stays plain math.min/max); the
    * render sites decode by the column's data type.
    */
  /** THE data types whose parquet footer min/max this engine trusts —
    * the single definition behind Store.mmStatCols, the DSv2 builder's
    * gate, and the FooterRangeAggregates rule's gate (three consumers
    * that must never drift: a type admitted in one but not another
    * silently degrades to a scan with no error). Integer-family is
    * exact by construction; float/double under the per-file NaN-proof
    * discipline ([[fileFooterAgg]]); string/binary refuse (truncation +
    * legacy-comparator hazards).
    */
  private[graft] def footerMinMaxTrusted(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.DoubleType |
         org.apache.spark.sql.types.FloatType => true
    case _ => false
  }

  /** created_by vintage matcher for the float/double NaN-proof gate. */
  private val ParquetMrVersion = """parquet-mr version (\d+)\.(\d+)""".r

  /** Explicit allowlist of parquet-mr (major, minor) vintages whose
    * NaN-omission behavior has been PROBED (tools/NanProbe + the
    * NanProofVintageSpec that re-proves it on the runtime jar every
    * `sbt test`). Deliberately NOT an open-ended `>= 1.16`: the parquet
    * spec's direction (nan_count / NaN-skipping finite bounds,
    * PARQUET-1222) means a FUTURE parquet-mr may legitimately write
    * finite min/max on NaN-bearing chunks — an unprobed newer vintage
    * must refuse float/double footer answers (perf-only) rather than
    * silently drop NaN from a footer-answered max(). Extend this set
    * only after re-running the probe on that vintage.
    */
  private[graft] val NanProofProbedVintages: Set[(Int, Int)] = Set((1, 16))

  private[graft] def sortableDoubleBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  private[graft] def sortableBitsToDouble(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & 0x7fffffffffffffffL))

  /** One file's footer aggregate for [[Store!.footerAgg]]. STATIC so
    * executor closures capture only strings — never a Store. Exactness
    * discipline: a row-bearing group with absent/untyped stats drops
    * the column from the ok sets, which vetoes the aggregate pushdown
    * for it. Min/max is tracked only for `mmCols`: the integer-family
    * columns (INT64/INT32 physical, where footer stats are exact by
    * construction — no truncation, no legacy-UTF-8-comparator
    * ambiguity) plus float/double under the NaN-PROOF discipline
    * (r13 verdict task #8): parquet-java — this store's own writer —
    * OMITS a chunk's min/max entirely when any NaN was seen (probed on
    * 1.16: a single NaN value leaves "min/max not defined"), so
    * stats-present proves the chunk NaN-free and its min/max exact;
    * a chunk with values but no stats (the NaN case, or a stats-less
    * foreign writer) drops the column from the ok set — the strict
    * stats-missing veto. A decoded NaN from some hypothetical foreign
    * writer that stores NaN bounds is refused defensively.
    */
  private[graft] def fileFooterAgg(
      conf: org.apache.hadoop.conf.Configuration, f: String,
      cols: Seq[String], mmCols: Set[String]): FileFooterStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
    try {
      // the NaN-proof discipline (stats-present ⇒ NaN-free) is a
      // WRITER property, probed on parquet-mr: it omits a chunk's
      // min/max when any NaN was seen. arrow-cpp (pyarrow/pandas — the
      // reference's own writer) instead SKIPS NaNs and records finite
      // bounds, so a foreign file's finite stats prove nothing about
      // NaN and footer-answering max() would silently disagree with
      // the scan (Spark orders NaN greatest). Strict veto: float/double
      // min/max is trusted only under a parquet-mr created_by; integer
      // columns are unaffected (no NaN exists to skip).
      val createdBy = Option(r.getFooter.getFileMetaData.getCreatedBy).getOrElse("")
      // ...and the proof is a VINTAGE property too: the omission
      // behavior was probed on parquet-mr 1.16 (tools/NanProbe); older
      // parquet-mr writers' NaN handling varied (PARQUET-1222 history —
      // some recorded finite bounds while SKIPPING NaNs, exactly the
      // unprovable case) and FUTURE ones may adopt the spec's
      // NaN-skipping finite bounds. Trust ONLY the explicitly probed
      // major.minor allowlist; anything else refuses float/double,
      // which is perf-only.
      val floatProofOk = {
        val m = ParquetMrVersion.findFirstMatchIn(createdBy)
        m.exists(g =>
          NanProofProbedVintages.contains((g.group(1).toInt, g.group(2).toInt)))
      }
      val blocks = r.getFooter.getBlocks.asScala
      var rows = 0L
      val nonNull = scala.collection.mutable.Map(cols.map(_ -> 0L): _*)
      val nullOk = scala.collection.mutable.Set(cols: _*)
      val mm = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val mmOk = scala.collection.mutable.Set(mmCols.toSeq: _*)
      blocks.foreach { b =>
        rows += b.getRowCount
        val byName = b.getColumns.asScala
          .map(c => c.getPath.toDotString.toUpperCase -> c).toMap
        cols.foreach { col =>
          byName.get(col.toUpperCase) match {
            case Some(c) =>
              val st = c.getStatistics
              val nullsKnown = st != null && !st.isEmpty && st.isNumNullsSet
              if (nullsKnown) nonNull(col) += b.getRowCount - st.getNumNulls
              else if (b.getRowCount > 0) nullOk -= col
              if (mmCols.contains(col) && b.getRowCount > 0) {
                if (st == null || st.isEmpty) mmOk -= col
                else if (st.hasNonNullValue) {
                  val loHi = (st.genericGetMin, st.genericGetMax) match {
                    case (lo: java.lang.Long, hi: java.lang.Long) =>
                      Some((lo.longValue, hi.longValue))
                    case (lo: java.lang.Integer, hi: java.lang.Integer) =>
                      Some((lo.longValue, hi.longValue))
                    case (lo: java.lang.Double, hi: java.lang.Double) =>
                      // foreign writer (NaN-skipping stats possible) or
                      // NaN bounds → the proof fails, refuse the column.
                      // A ±0.0 bound is refused too: parquet-mr WIDENS
                      // signed zeros (an actual min of +0.0 is recorded
                      // as -0.0, an actual max of -0.0 as +0.0), so a
                      // zero bound's sign is unknowable from the footer
                      // and a footer answer could render the opposite
                      // zero from the scan path — numerically equal but
                      // bit-distinguishable, breaking the exactness
                      // contract. (`x == 0.0` is true for both signs.)
                      if (!floatProofOk || lo.isNaN || hi.isNaN ||
                        lo.doubleValue == 0.0 || hi.doubleValue == 0.0) None
                      else Some((sortableDoubleBits(lo.doubleValue),
                        sortableDoubleBits(hi.doubleValue)))
                    case (lo: java.lang.Float, hi: java.lang.Float) =>
                      if (!floatProofOk || lo.isNaN || hi.isNaN ||
                        lo.floatValue == 0.0f || hi.floatValue == 0.0f) None
                      else Some((sortableDoubleBits(lo.doubleValue),
                        sortableDoubleBits(hi.doubleValue)))
                    case _ => None // unexpected physical type
                  }
                  loHi match {
                    case Some((lo, hi)) =>
                      val cur = mm.get(col)
                      mm(col) = (cur.fold(lo)(c0 => math.min(c0._1, lo)),
                        cur.fold(hi)(c0 => math.max(c0._2, hi)))
                    case None => mmOk -= col
                  }
                } else if (!(st.isNumNullsSet && st.getNumNulls == b.getRowCount)) {
                  mmOk -= col // no values recorded, not provably all-null
                }
              }
            case None => if (b.getRowCount > 0) { nullOk -= col; mmOk -= col }
          }
        }
      }
      FileFooterStats(f, rows, nonNull.toMap, nullOk.toSet, mm.toMap, mmOk.toSet)
    } finally r.close()
  }

  /** Epoch-µs → Timestamp, floor semantics for negative values. */
  private[sources] def microsToTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Timestamp → epoch-µs, the exact inverse of [[microsToTimestamp]]
    * (floor semantics pre-1970: getTime already floors to ms and
    * getNanos carries the sub-second remainder). ONE definition shared
    * by every conversion site so the floor discipline cannot drift.
    */
  private[graft] def timestampToMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private val SchemaFile = "schema.json"
  private val LayoutFile = "layout.json"
  private val ItemsDir = "items"
  private val StagingDir = ".staging"
  private val VersionedMarker = "versioned"
  private[sources] val CurrentPtr = "_current"
  private val LeaseDir = ".lease"

  /** JVM-wide per-(store, item) mutation locks. Every mutating control-
    * plane op runs on the DRIVER (they orchestrate Spark jobs, they
    * don't run inside them), so one JVM is the natural mutual-exclusion
    * domain: serializing same-item mutations here closes the real
    * single-driver races — two concurrent `mode("append")` jobs into
    * one directory share the committer's `_temporary/0` staging dir
    * (one job's cleanup can delete the other's in-flight task files),
    * and a compact swap racing an append can strand the appended files
    * in the swapped-out dir. Different items lock independently, so
    * parallel multi-item ingest keeps its concurrency. Writers in
    * OTHER JVMs are outside this domain — for them the staging age
    * guard ([[Store!.vacuum]]) is the (weaker, documented) protection;
    * multi-driver coordination needs an external lock service.
    */
  private val itemLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()
  private[sources] def lockFor(base: HPath, key: String): java.util.concurrent.locks.ReentrantLock =
    itemLocks.computeIfAbsent(
      base.toString + "#" + key,
      _ => new java.util.concurrent.locks.ReentrantLock())

  /** Staging ids (the UUID suffix of `.tmp-`/`.old-`/`.swap-`/`.mid-`/
    * `.del-` entries) of ops in flight IN THIS JVM. [[Store!.vacuum]]
    * skips them unconditionally — unlike the age guard, this makes a
    * force-sweep (`vacuum(0)`) safe against same-driver concurrent
    * maintenance, not just old debris.
    */
  private[sources] val activeStagingIds: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Tags (base#KEY) of items with an IN-PLACE append running in this
    * JVM ([[Store!.appendNewOnly]]'s `mode("append")` job — the one
    * write that materializes committer staging inside the LIVE data
    * dir). [[Store!.vacuum]]'s job-staging debris sweep (job 4) skips
    * them unconditionally, same split as [[activeStagingIds]]: this set
    * makes a force-sweep safe against same-driver concurrent appends,
    * the age guard covers writers in other JVMs.
    */
  private[graft] val activeInPlaceWrites: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def inPlaceTag(base: HPath, key: String): String =
    base.toString + "#" + key

  /** The one list of staging-entry name tokens — [[stagingId]] (the
    * in-flight guard) and `stagingEntries` (the mutation gate) must
    * agree on it, or a marker kind added to one but not the other would
    * silently escape that guard.
    */
  private[sources] val MarkerTokens: Seq[String] =
    Seq(".tmp-", ".old-", ".swap-", ".mid-", ".del-")

  /** Rebuild a Hadoop Configuration from shipped driver entries — a
    * STATIC helper so executor closures capture only the entry Seq,
    * never a Store instance (see [[Store!.hadoopConfEntries]]).
    */
  private[sources] def confFrom(
      entries: Seq[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** UUID suffix of a staging entry name, if it has one. */
  private[sources] def stagingId(name: String): Option[String] =
    MarkerTokens.iterator
      .map(t => (t, name.indexOf(t)))
      .collectFirst { case (t, i) if i >= 0 => name.substring(i + t.length) }

  /** Session conf pinned by [[open]] and guarded per write — see
    * [[Store!.requireMicrosTimestamps]]. */
  private[sources] val TimestampTypeKey = "spark.sql.parquet.outputTimestampType"

  /** THE one pin of the INT64-micros parquet-timestamp invariant,
    * shared by Store.open, the SQL INSERT path, and the streaming sink
    * (two near-identical copies diverged once; never again). Pins the
    * session conf when its effective value is anything else, with a
    * WARN naming who pinned and what the prior value was. The prior
    * value may be Spark's registered default (INT96) — RuntimeConfig
    * cannot distinguish a default from an explicit setting, so the
    * message claims neither. Why a permanent pin and not a scoped
    * set/restore: a restore racing a concurrent write (a resident
    * ingest, another INSERT) can land stat-less INT96 store files
    * after the per-write guard passed — the interleaving
    * [[Store!.requireMicrosTimestamps]] documents as unsafe.
    */
  private[sources] def pinMicros(spark: SparkSession, what: String): Unit = {
    val prior = spark.conf.getOption(TimestampTypeKey)
    if (!prior.contains("TIMESTAMP_MICROS")) {
      org.slf4j.LoggerFactory.getLogger(classOf[Store]).warn(
        s"$what is pinning $TimestampTypeKey=TIMESTAMP_MICROS for this " +
          s"session (was '${prior.getOrElse("unset")}'): store files need " +
          "INT64-micros column statistics for range pruning and footer " +
          "stats; set the conf back per write if a downstream truly " +
          "requires INT96")
      spark.conf.set(TimestampTypeKey, "TIMESTAMP_MICROS")
    }
  }

  /** Time-bucket granularities for directory partitioning. Formats are
    * zero-padded so lexicographic string comparison equals time order —
    * that is what makes partition pruning expressible as a string range
    * predicate on the bucket column.
    */
  val BucketFormats: Map[String, String] = Map(
    "day" -> "yyyy-MM-dd",
    "month" -> "yyyy-MM",
    "year" -> "yyyy"
  )

  /** Open or create a store at `basePath` (reference Store.__init__,
    * oakstore/store.py:80-128). The schema (value columns + time index)
    * is persisted as JSON on first create and enforced on reopen:
    * passing a conflicting schema to an existing store raises
    * [[SchemaError]] (store.py:113-117).
    *
    * `basePath` is any Hadoop-FileSystem URI — `/local/dir`,
    * `file:/local/dir`, `hdfs://nn/warehouse/store`, `s3a://bucket/store`
    * — the control plane (schema/layout persistence, item listing,
    * staging swaps, retention, vacuum) runs through
    * `org.apache.hadoop.fs.FileSystem` resolved from the path scheme, the
    * same abstraction the Spark data plane already uses, so a 100 TB
    * store can live on the object store next to its compute. This closes
    * the reference's own unmet TODO (cloud storage, store.py:86).
    *
    * `bucket` (None | "day" | "month" | "year") selects directory-level
    * time partitioning: items are written `partitionBy` a derived bucket
    * column so range queries prune whole directories before any file I/O
    * — the at-scale complement of the reference's row-group-stat pruning
    * (store.py:255-264). Persisted and enforced like the schema. Bucket
    * strings are rendered in the session timezone at write AND query
    * time; the creating session's timezone is persisted alongside the
    * bucket and a reopen under a different timezone fails fast (silently
    * mis-pruned partitions otherwise).
    *
    * `chunkRows` caps rows per written Parquet file — the reference pins
    * 1 M-row sorted chunks (store.py:27, applied store.py:174) so
    * row-group min/max stats stay uniformly selective; same default.
    *
    * `versioned = true` selects the OBJECT-STORE-NATIVE item layout:
    * each item's data lives in immutable `v-<id>` version directories
    * and the active one is named by a single `_current` pointer object.
    * Rewrites (append/compact) write a fresh version and commit it with
    * ONE pointer overwrite — a single-object PUT, atomic on every real
    * object store — so no directory rename exists anywhere on the write
    * path and a crash at any point leaves readers on the old complete
    * version (orphaned versions swept by [[Store!.vacuum]]). The flat
    * layout (default) keeps in-place appends cheapest on rename-atomic
    * filesystems; versioned trades a pointer read per operation for
    * rename-free atomicity. Persisted like the schema; a flat store
    * cannot be reopened as versioned (the data would need migration),
    * while a versioned store serves any caller transparently.
    *
    * `writerLease = true` additionally takes a cross-JVM lease file per
    * mutated item (exclusive create + TTL + steal-on-expiry, contract
    * at [[Store!.withLease]]) — the JVM-wide per-item locks only
    * serialize writers inside ONE driver; the lease extends that to
    * concurrent drivers sharing a store. An operational mode of this
    * process, not a property of the data: it is NOT persisted, so every
    * writer of a multi-driver deployment must opt in.
    *
    * SESSION-WIDE SIDE EFFECT: open pins
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` for the
    * whole SparkSession (rationale at [[Store#requireMicrosTimestamps]]).
    * Every later parquet write in the session — including ones that
    * never touch this store — emits INT64-micros timestamps instead of
    * Spark's INT96 default. That is a strict improvement for stats and
    * pruning, but consumers that expected INT96 (e.g. pandas readers
    * treating INT96 as tz-naive) will see tz-aware µs timestamps; set
    * the conf back per write if a downstream truly requires INT96.
    */
  def open(
      spark: SparkSession,
      basePath: String,
      cols: Option[Seq[(String, DataType)]] = None,
      index: Option[String] = None,
      bucket: Option[String] = None,
      chunkRows: Long = 1000000L,
      versioned: Boolean = false,
      writerLease: Boolean = false
  ): Store = {
    bucket.foreach { b =>
      require(BucketFormats.contains(b), s"bucket must be one of ${BucketFormats.keys}")
    }
    require(chunkRows > 0, "chunkRows must be positive")
    // Pin INT64-micros parquet timestamps for the session ONCE, here
    // (one WARN per session, see [[pinMicros]]). The former per-write
    // conf swap (set + finally-restore) raced concurrent writers: a
    // resident ingestStream restoring the conf mid-batch-write landed
    // INT96 files — which carry NO column statistics, silently
    // disabling row-group pruning and describe() footer min/max. A
    // session invariant enforced per-write (like the timezone guard)
    // has no such window.
    pinMicros(spark, s"Store.open($basePath)")
    val raw = new HPath(basePath)
    // sparkContext.hadoopConfiguration carries the deployment's fs.*
    // settings (credentials, endpoints) — the same conf the parquet
    // data plane resolves schemes with, so control and data plane
    // always agree on what a path means.
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(raw)
    if (writerLease) requireExactLease(base)
    fs.mkdirs(new HPath(base, ItemsDir))
    val schemaPath = new HPath(base, SchemaFile)
    val layoutPath = new HPath(base, LayoutFile)
    val sessionTz = spark.conf.get("spark.sql.session.timeZone")
    val requested = cols.map(cs =>
      buildSchema(cs, index.getOrElse(DefaultIndex))
    )
    if (fs.exists(schemaPath)) {
      val persisted = readSchema(fs, schemaPath)
      requested.foreach { r =>
        if (r.json != persisted.json)
          throw new SchemaError(
            s"store at $basePath already has schema ${persisted.catalogString}; " +
              s"conflicting schema ${r.catalogString} requested"
          )
      }
      val (persistedBucket, storeTz, persistedVersioned) = readLayout(fs, base)
      bucket.foreach { b =>
        if (!persistedBucket.contains(b))
          throw new SchemaError(
            s"store at $basePath has bucket layout $persistedBucket; conflicting bucket '$b' requested"
          )
      }
      // no timezone gate on OPEN: reads and label-driven maintenance
      // render every bucket bound under the PERSISTED store timezone
      // ([[bucketLabel]]) and compare instants otherwise, so a session
      // in any timezone reads correctly; only bucketed WRITES require
      // alignment and their per-write guard ([[requireTzAligned]])
      // fails fast with the remedy. A read-only consumer in another
      // timezone — the common multi-region deployment — just works.
      // the layout is a property of the data on disk: an existing store
      // keeps its persisted layout (flat callers transparently read a
      // versioned store), but explicitly requesting versioned semantics
      // on a flat store must fail — the caller is relying on atomic
      // pointer swaps the flat layout cannot provide
      if (versioned && !persistedVersioned)
        throw new SchemaError(
          s"store at $basePath was created with the flat item layout; " +
            "it cannot be reopened as versioned")
      new Store(spark, base, persisted, persistedBucket, chunkRows, storeTz,
        persistedVersioned, writerLease)
    } else {
      val schema = requested.getOrElse(
        buildSchema(DefaultColumns, index.getOrElse(DefaultIndex))
      )
      writeUTF8(fs, schemaPath, schema.json)
      bucket.foreach(b => writeUTF8(fs, layoutPath, s"$b\n$sessionTz"))
      if (versioned) writeUTF8(fs, new HPath(base, VersionedMarker), "1")
      new Store(spark, base, schema, bucket, chunkRows, sessionTz, versioned,
        writerLease)
    }
  }

  /** Read-only attach to an EXISTING store: loads the persisted
    * schema/layout and builds a handle without creating anything on
    * disk and without pinning any session conf — the entry point for
    * metadata-only consumers like the `graft` DataSource V2 table
    * provider ([[graft.sources.v2.GraftDataSource]]), where a path
    * typo must fail fast instead of materializing an empty store the
    * way [[open]]'s create-if-absent contract would. Reads through the
    * returned handle are full-fidelity (bucket pruning, tz guard);
    * WRITES through it still work but require the session to carry
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (the
    * per-write guard names the remedy) — writers should use [[open]],
    * which pins it.
    *
    * `writerLease` opts writes through THIS handle into the cross-JVM
    * lease, same contract as [[open]]. It matters for the DSv2 INSERT
    * path: in a multi-driver deployment where every writer leases, an
    * attach-backed SQL INSERT without it would mutate under only the
    * in-JVM lock — pass the `writerLease` table option there.
    */
  def attach(
      spark: SparkSession,
      basePath: String,
      writerLease: Boolean = false): Store = {
    val raw = new HPath(basePath)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(raw)
    if (writerLease) requireExactLease(base)
    val schemaPath = new HPath(base, SchemaFile)
    if (!fs.exists(schemaPath))
      throw new SchemaError(s"no graft store at $basePath (missing $SchemaFile)")
    val persisted = readSchema(fs, schemaPath)
    val (bucket, storeTz, versioned) = readLayout(fs, base)
    new Store(spark, base, persisted,
      bucket = bucket, storeTz = storeTz, versioned = versioned,
      writerLease = writerLease)
  }

  /** The ONE reader of a store's persisted layout — (bucket, storeTz,
    * versioned) — shared by [[open]] and [[attach]] so the parsing and
    * defaulting rules can never diverge between the write-side and the
    * read-only entry points. A missing layout file means unbucketed; a
    * missing timezone line means the pre-tz vintage's hard-coded UTC
    * invariant (NOT "skip the check"); versioned-ness is the marker
    * file's existence.
    */
  private def readLayout(
      fs: FileSystem, base: HPath): (Option[String], String, Boolean) = {
    val layoutPath = new HPath(base, LayoutFile)
    val lines =
      if (fs.exists(layoutPath))
        readUTF8(fs, layoutPath).split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq.empty
    (lines.headOption,
      lines.drop(1).headOption.getOrElse("UTC"),
      fs.exists(new HPath(base, VersionedMarker)))
  }

  /** Index column first (TimestampType), then value columns, all
    * uppercased — the reference uppercases names at ingest
    * (store.py:159-160) and keys on disk (store.py:191).
    */
  private def buildSchema(
      cols: Seq[(String, DataType)],
      index: String
  ): StructType =
    StructType(
      StructField(index.toUpperCase, TimestampType) +:
        cols.map { case (n, t) => StructField(n.toUpperCase, t) }
    )

  private def readSchema(fs: FileSystem, p: HPath): StructType =
    DataType.fromJson(readUTF8(fs, p)).asInstanceOf[StructType]

  private[graft] def readUTF8(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Slot number of a lease-log entry name (`e<zero-padded seq>`) —
    * the ONE parser of the log's naming scheme, shared by the protocol
    * ([[Store!.withLease]]) and the diagnostic below.
    */
  /** How the lease's slot claims achieve exclusive-create EXACTNESS on
    * a given filesystem scheme (protocol at [[Store!.withLease]]):
    *
    *  - [[CreateExact]]: `fs.create(overwrite = false)` is atomic on
    *    this filesystem — HDFS-family schemes, plus any scheme the
    *    operator ATTESTS via
    *    `-Dgraft.store.lease.exactCreateSchemes=s3a,gs,...` (the knob
    *    for object-store connectors whose exclusive create maps to a
    *    conditional If-None-Match PUT — e.g. s3a with conditional
    *    create enabled, gcs preconditions — which this zero-egress
    *    build cannot probe live).
    *  - [[NioExact]]: the local filesystem. Hadoop's
    *    RawLocalFileSystem `create(false)` is CHECK-THEN-ACT, but the
    *    OS underneath has true O_CREAT|O_EXCL — slot claims go through
    *    `java.nio.file.Files.createFile` on the local path, so the
    *    local scheme is exact too (the arbitration is the create; the
    *    content write happens on the exclusively-owned slot after).
    *  - [[NotExact]]: everything else. The lease REFUSES LOUDLY at
    *    `Store.open(writerLease = true)` instead of degrading to a
    *    silent best-effort mode: a mutual-exclusion primitive that is
    *    only usually exclusive is worse than none, because callers
    *    build correctness on it. The error names both remedies
    *    (attest the scheme, or run single-driver under the in-JVM
    *    item locks).
    */
  private[sources] sealed trait ClaimMode
  private[sources] case object CreateExact extends ClaimMode
  private[sources] case object NioExact extends ClaimMode
  private[sources] final case class NotExact(scheme: String) extends ClaimMode

  private[sources] def claimMode(scheme: String): ClaimMode = {
    val sch = Option(scheme).getOrElse("file").toLowerCase
    val attested = sys.props.get("graft.store.lease.exactCreateSchemes")
      .iterator.flatMap(_.split(",")).map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSet
    // local wins over attestation: O_EXCL via java.nio is strictly
    // stronger than Hadoop's check-then-act local create, so attesting
    // 'file' (cargo-cult "attest everything I use") must not DOWNGRADE
    // local claims to the racy path
    if (sch == "file" || sch == "local") NioExact
    else if (attested.contains(sch)) CreateExact
    else if (Set("hdfs", "viewfs", "webhdfs", "swebhdfs").contains(sch)) CreateExact
    else NotExact(sch)
  }

  /** Loud refusal for [[NotExact]] schemes — called by every
    * `writerLease = true` entry point, so the failure happens at open
    * time with the remedy named, not at the first mutation.
    */
  private[sources] def requireExactLease(base: HPath): Unit =
    claimMode(base.toUri.getScheme) match {
      case NotExact(sch) =>
        throw new SchemaError(
          s"writerLease on scheme '$sch' ($base): exclusive create is not " +
            "known to be atomic here, and a best-effort writer lease would " +
            "be a silent mutual-exclusion hazard. If this connector maps " +
            "create-without-overwrite to a conditional PUT (If-None-Match), " +
            s"attest it with -Dgraft.store.lease.exactCreateSchemes=$sch; " +
            "otherwise run writers in one driver (the in-JVM item locks " +
            "serialize them) or on an HDFS-family / local store path")
      case _ => ()
    }

  private[sources] def leaseSeqOf(name: String): Option[Long] =
    if (name.length > 1 && name.charAt(0) == 'e')
      scala.util.Try(name.substring(1).toLong).toOption
    else None

  /** Diagnostic view of one item's lease-log directory (protocol at
    * [[Store!.withLease]]): the (uuid, expiryEpochMillis) of the MAX
    * slot entry — None when no lease was ever taken. A RELEASED lease
    * reads ("-", 0): released is a sentinel slot, not an absent
    * directory, because deleting the max entry would let two contenders
    * disagree about the next slot number. The judgment matches the
    * protocol's exactly: only the TRUE max entry counts, and an
    * unreadable/unparseable max reports ("<unparseable>", -1) — it must
    * NOT fall back to a stale lower slot, which could report "released"
    * while every writer is actually wedged on the torn max.
    */
  def leaseState(fs: FileSystem, leaseDir: HPath): Option[(String, Long)] = {
    val entries =
      try fs.listStatus(leaseDir).toSeq.flatMap { s =>
        leaseSeqOf(s.getPath.getName).map(_ -> s.getPath)
      } catch { case _: java.io.IOException => Seq.empty }
    entries.maxByOption(_._1).map { case (_, p) =>
      (try {
        val lines = readUTF8(fs, p).split("\n")
        lines.lift(1).flatMap(e => scala.util.Try(e.trim.toLong).toOption)
          .map(exp => (lines.head.trim, exp))
      } catch { case _: Throwable => None })
        .getOrElse(("<unparseable>", -1L))
    }
  }

  /** Single-stream create-and-close: on object stores the object only
    * becomes visible at close, which makes each marker/metadata write
    * all-or-nothing — the property the swap protocol leans on.
    */
  private[graft] def writeUTF8(
      fs: FileSystem, p: HPath, s: String, overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}

/** A keyed, schema-enforced, append-only, time-partitioned Parquet store —
  * the reference's single abstraction (oakstore/store.py) re-expressed on
  * Spark. Each item is a Parquet dataset directory under `items/<KEY>`;
  * reads are lazy DataFrames; the time index is an ordinary TimestampType
  * column used for range-partitioned writes and pushdown range queries.
  *
  * Scale posture: writes are `repartitionByRange` on the index so Parquet
  * row-group min/max stats are selective (the reference's 1M-row sorted
  * chunks, store.py:27,174); range queries push `>=`/`<=` filters into the
  * Parquet scan (store.py:255-264 equivalent comes free from Catalyst);
  * appends have an O(new) anti-join path instead of the reference's
  * O(history) rewrite (store.py:225-236). The control plane runs on
  * `org.apache.hadoop.fs.FileSystem`, so base paths may be `file:`,
  * `hdfs:`, `s3a:`, … — wherever the data plane can read, the
  * maintenance ops can manage.
  */
class Store private[sources] (
    val spark: SparkSession,
    val base: HPath,
    val schema: StructType,
    val bucket: Option[String] = None,
    val chunkRows: Long = 1000000L,
    val storeTz: String = "UTC",
    val versioned: Boolean = false,
    val writerLease: Boolean = false
) {
  import Store._

  /** Driver-side FileSystem handle for the store's scheme. Hadoop caches
    * FileSystem instances per (scheme, authority, ugi), so this is a
    * lookup, not a connection per Store; never closed (the cache owns it).
    */
  @transient private[sources] val fs: FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Time-index column name (always schema head). */
  val indexName: String = schema.fields.head.name

  private val BucketCol = "__bucket"
  private def bucketFmt: Option[String] = bucket.map(BucketFormats)

  private def itemsRoot: HPath = new HPath(base, ItemsDir)
  private def stagingRoot: HPath = new HPath(base, StagingDir)
  private def leaseRoot: HPath = new HPath(base, LeaseDir)

  /** Serialize same-item mutations within this JVM (see
    * [[Store$.lockFor]]); reads never take it. When the store was
    * opened with `writerLease = true`, the outermost hold additionally
    * takes the cross-JVM [[withLease]] on the item.
    */
  /** Columns whose footer min/max this engine trusts — the schema
    * projection of [[Store$.footerMinMaxTrusted]] (one shared type
    * predicate; see its scaladoc for the discipline).
    */
  private[sources] def mmStatCols: Set[String] =
    schema.fields.filter(f => Store.footerMinMaxTrusted(f.dataType))
      .map(_.name).toSet

  private def withItemLock[T](key: String)(body: => T): T = {
    val l = Store.lockFor(base, validateKey(key))
    l.lock()
    try {
      if (writerLease && l.getHoldCount == 1) withLease(validateKey(key))(body)
      else body
    } finally l.unlock()
  }

  /** Opt-in CROSS-JVM writer mutual exclusion (`writerLease = true` at
    * [[Store$.open]]), as a SLOT LOG: each item's lease is a directory
    * `.lease/<KEY>/` of immutable numbered entries `e<seq>`, content
    * `<uuid>\n<expiryEpochMillis>`. The lease state is always the
    * HIGHEST-numbered entry; EVERY transition — acquire, steal of an
    * expired lease, renew, release — is performed by creating entry
    * `seq+1` with `create(overwrite = false)`, so contention for any
    * transition is arbitrated by atomic exclusive create and NOTHING is
    * ever deleted during contention (superseded entries are garbage-
    * collected only after a higher slot exists, which every reader's
    * max-seq rule already prefers). Release writes a `-\n0` sentinel
    * slot rather than deleting — a deleted max entry would let two
    * contenders disagree about which slot number is next.
    *
    * Why the log shape: the previous protocol stole an expired lease by
    * delete-then-create, and two stealers deciding in the same instant
    * could both proceed (the delete of one could remove the other's
    * FRESH lease — a TOCTOU a plain filesystem cannot close without a
    * conditional delete). In the log protocol that race is gone BY
    * CONSTRUCTION: both stealers target the same next slot and exactly
    * one create wins; the loser re-reads and sees a live foreign lease.
    * The same argument covers a renewer racing a thief (both target
    * `seq+1`) and a release racing a late renewal.
    *
    * One residual race the log alone does not close: garbage
    * collection of superseded slots RECYCLES slot numbers, so a
    * contender stalled between choosing `seq+1` and creating it can
    * win the create of a number that was already claimed, superseded,
    * and swept — under a live foreign lease at a higher slot (the
    * classic ABA). Therefore every successful claim is CONFIRMED by a
    * fresh listing before the claimant acts as holder: the max
    * sequence is monotone (nothing ever deletes the max), so a
    * recycled-number claim always shows a higher slot in the
    * confirmation listing, the claim is retired, and the claimant
    * re-enters the wait loop. An UNREADABLE confirmation is never
    * treated as held; what else it means depends on the caller:
    * acquire conservatively retires and retries under its deadline,
    * while the renewer leaves its (possibly true-max) slot standing
    * and re-reads next tick, and release lets its sentinel stand —
    * deleting a possibly-true max on absence of evidence would
    * regress the log.
    *
    * Exactness contract: mutual exclusion against a live holder is
    * EXACT everywhere the lease runs AT ALL — there is no best-effort
    * mode. Slot claims are arbitrated per [[Store$.claimMode]]: atomic
    * `create(overwrite = false)` on HDFS-family schemes and
    * operator-attested conditional-PUT connectors
    * (`-Dgraft.store.lease.exactCreateSchemes`), true O_EXCL via
    * java.nio on the local scheme (where Hadoop's own create is
    * check-then-act), and a LOUD REFUSAL at open on anything else —
    * a lease that is only usually exclusive would be a silent hazard
    * callers build correctness on. StoreLeaseSpec proves the exact
    * case: an injected FileSystem whose exclusive create IS atomic
    * runs a many-contender steal stress with an invariant
    * single-holder counter, and a non-atomic unattested FS is proven
    * to refuse. The inherent lease caveats remain: expiry
    * compares the local clock to the writer's stamp (keep TTL ≫ clock
    * skew), and a holder paused longer than its TTL between renewer
    * ticks can believe it holds for up to one tick after losing — the
    * residue every lease design shares unless the protected resource
    * itself validates tokens.
    *
    * TTL `-Dgraft.store.lease.ttlMs` (default 1 h, matching [[vacuum]]'s
    * age guard) bounds the outage a crashed holder causes; contenders
    * poll until `-Dgraft.store.lease.waitMs` (default 60 s) then fail
    * loudly, naming the remedy. A daemon thread renews every ttl/4
    * while the op runs — the TTL is a crashed-writer detector, not a
    * bound on op duration. An unparseable max entry (torn write, or a
    * pre-log-vintage lease FILE at the dir's path) is neither held nor
    * expired: contenders wait to their deadline and fail loudly; the
    * named remedy is deleting the corrupt entry.
    */
  private[graft] def withLease[T](k: String)(body: => T): T = {
    val dir = new HPath(leaseRoot, k)
    val id = java.util.UUID.randomUUID().toString
    val ttl = sys.props.get("graft.store.lease.ttlMs").map(_.toLong)
      .getOrElse(3600000L)
    val wait = sys.props.get("graft.store.lease.waitMs").map(_.toLong)
      .getOrElse(60000L)
    val deadline = System.currentTimeMillis() + wait
    def stamp(): String = s"$id\n${System.currentTimeMillis() + ttl}"
    def entryName(seq: Long): String = f"e$seq%019d"
    def seqOf(name: String): Option[Long] = Store.leaseSeqOf(name)
    // The lease view MUST distinguish "no lease exists" from "I could
    // not look": a transient listStatus failure read as an empty log
    // would let a contender claim slot 1 while a foreign holder is
    // live at a higher slot (e1 is long GC'd in steady state) — a
    // silent mutual-exclusion violation. NoLease is only concluded
    // from a SUCCESSFUL listing (or the dir genuinely missing);
    // everything else is Unknown, which every caller treats like a
    // live foreign lease: wait and retry, never act.
    sealed trait View
    case object NoLease extends View
    case object Unknown extends View
    case class Cur(seq: Long, uuid: String, exp: Option[Long]) extends View
    // Cur.exp None = torn/garbage entry (neither held nor expired).
    // A read failure on the max entry usually means a newer slot landed
    // and GC removed this one — re-LIST (never re-read blind), bounded.
    def state(): View = {
      var tries = 0
      while (true) {
        tries += 1
        val entries =
          try fs.listStatus(dir).flatMap(s =>
            seqOf(s.getPath.getName).map(_ -> s.getPath))
          catch {
            case _: java.io.FileNotFoundException =>
              return NoLease // dir never created: genuinely no lease
            case _: java.io.IOException if tries < 5 =>
              Thread.sleep(20L * tries); null
            case _: java.io.IOException => return Unknown
          }
        if (entries != null) {
          if (entries.isEmpty) return NoLease
          val (mx, p) = entries.maxBy(_._1)
          try {
            val lines = readUTF8(fs, p).split("\n")
            return Cur(mx, lines.headOption.getOrElse("").trim,
              lines.lift(1).flatMap(s => scala.util.Try(s.trim.toLong).toOption))
          } catch {
            case _: Throwable if tries < 5 => Thread.sleep(20L * tries)
            case _: Throwable => return Cur(mx, "", None) // torn: wait path
          }
        }
      }
      Unknown // unreachable
    }
    // Claim = exclusive create of the slot file + content write. The
    // two failure modes are NOT symmetric: a failed CREATE means we
    // lost the race (someone else owns the slot — back off), but a
    // failed content WRITE after our create succeeded means the slot
    // is OURS and currently 0 bytes — left behind, that torn max entry
    // wedges every reader forever ("neither held nor expired": release
    // gives up, contenders wait out their deadline). Since create
    // arbitration makes the slot exclusively ours, retiring the empty
    // file is safe and returns the log to the previous max, as if the
    // claim never happened. The concrete trigger observed as a suite
    // intermittent: the release path interrupts the renewer, and the
    // interrupt can surface as an IOException inside the renewer's
    // in-flight claim write — create landed, content didn't. The
    // interrupt flag is parked around the cleanup so the delete itself
    // is not sabotaged by it.
    val nioClaim = Store.claimMode(base.toUri.getScheme) == Store.NioExact
    def claim(seq: Long, content: String): Boolean = {
      val p = new HPath(dir, entryName(seq))
      try fs.mkdirs(dir) catch { case _: java.io.IOException => return false }
      val out =
        if (nioClaim) {
          // local FS: Hadoop's create(overwrite=false) is
          // check-then-act, but the OS has true O_CREAT|O_EXCL — the
          // ARBITRATION is the nio createFile; the content then goes
          // into the exclusively-owned slot via an overwrite stream
          // (same two-step shape as an object store's conditional PUT
          // followed by content visibility at close)
          val f = new java.io.File(p.toUri.getPath)
          try java.nio.file.Files.createFile(f.toPath)
          catch { case _: Throwable => return false } // lost the race
          try fs.create(p, true)
          catch {
            case _: java.io.IOException =>
              // the slot IS ours (create won) but we cannot write it:
              // retire the empty file so the log returns to the prior
              // max, as if the claim never happened
              try fs.delete(p, false) catch { case _: Throwable => () }
              return false
          }
        } else {
          try fs.create(p, false)
          catch { case _: java.io.IOException => return false } // lost the race
        }
      try {
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.close()
        true
      } catch {
        case _: java.io.IOException =>
          val wasInterrupted = Thread.interrupted() // park the flag
          try out.close() catch { case _: Throwable => () }
          try fs.delete(p, false) catch { case _: Throwable => () }
          if (wasInterrupted) Thread.currentThread().interrupt()
          false
      }
    }
    // ABA guard. gc() deletes superseded slot files, so a contender
    // that stalled between deciding on a slot number and creating it
    // can exclusively create a number that was already claimed,
    // superseded, and swept — the create SUCCEEDS while a live foreign
    // lease sits at a higher slot (e.g. holder at N expires, a thief
    // advances to N+2 and gc's N+1; our stalled steal of N+1 then
    // lands). The closing property: creating a GC'd slot can only
    // succeed when a higher slot ALREADY exists (gc runs strictly
    // below the sweeping holder's slot, and the max entry is never
    // deleted — release writes a sentinel), and the max sequence is
    // MONOTONE (every transition creates a higher slot). So a
    // post-claim re-list always exposes the conflict, and once a
    // higher slot is visible the claim is lost FOR GOOD — no later
    // listing can make our slot the max again. Every successful claim
    // must therefore be confirmed before acting as holder; a lost or
    // unconfirmable claim is retired (the file is exclusively ours by
    // create arbitration and provably superseded, so no reader's max
    // is affected) and the caller re-enters its wait loop. An
    // unreadable confirmation listing counts as NOT confirmed — never
    // as held.
    // Three-valued on purpose: POSITIVE supersession (a higher slot
    // seen — lost for good, monotonicity) is very different evidence
    // from an UNCONFIRMABLE claim (listings failing or lagging), and
    // the callers must treat them differently — the acquire path may
    // conservatively treat unconfirmable as lost (deadline-guarded),
    // but the RENEWER must not delete what may be the true max nor
    // stop renewing on absence of evidence.
    sealed trait Confirm
    case object Confirmed extends Confirm
    case object Superseded extends Confirm
    case object Unconfirmable extends Confirm
    def confirmClaim(seq: Long, who: String): Confirm = {
      var tries = 0
      while (tries < 5) {
        tries += 1
        state() match {
          case Cur(s, uuid, _) if s == seq && uuid == who => return Confirmed
          case Cur(s, _, _) if s > seq => return Superseded
          case _ =>
            // torn read of our own entry, a listing that missed our
            // just-created file, or an outright failure: retry bounded
            Thread.sleep(20L * tries)
        }
      }
      Unconfirmable
    }
    def retire(seq: Long): Unit =
      try fs.delete(new HPath(dir, entryName(seq)), false)
      catch { case _: Throwable => () }
    // sweep superseded entries — only ever called by the CONFIRMED
    // current slot holder, and only for seqs below its own, so no
    // reader's max is affected (a reader catching a deleted entry
    // re-lists)
    def gc(current: Long): Unit =
      try fs.listStatus(dir).foreach { s =>
        seqOf(s.getPath.getName).foreach { q =>
          if (q < current) fs.delete(s.getPath, false)
        }
      } catch { case _: Throwable => () }

    // every blocked acquire path — live holder, torn entry, failed
    // claim, unreadable log — funnels through one deadline-guarded
    // wait, so no branch can busy-spin and no branch can out-wait the
    // contract silently
    def waitOrFail(now: Long, why: String): Unit =
      if (now >= deadline)
        throw new java.io.IOException(
          s"item $k: $why; gave up after $wait ms — raise " +
            "-Dgraft.store.lease.waitMs to wait longer")
      else Thread.sleep(math.max(1L, math.min(100L, deadline - now)))

    var heldSeq = -1L
    while (heldSeq < 0) {
      val now = System.currentTimeMillis()
      state() match {
        case NoLease =>
          // no entries: claim the first slot. A persistent claim
          // failure with an EMPTY log is not a lost race — e.g. a
          // pre-log-vintage lease FILE occupying the dir's path — so
          // the deadline applies here too, with the same loud failure.
          if (claim(1L, stamp())) confirmClaim(1L, id) match {
            case Confirmed => heldSeq = 1L
            case Superseded => retire(1L) // loop re-reads the foreign max
            case Unconfirmable =>
              // retire is safe (exclusively ours; at worst the log
              // returns to its prior state, as if the claim never
              // happened) — but the retry must stay deadline-guarded,
              // or alternating claim-success/confirm-failure could
              // spin past waitMs without ever failing loudly
              retire(1L)
              waitOrFail(now, s"slot claim at $dir succeeded but could not be confirmed (listings failing)")
          } else waitOrFail(now,
            s"cannot create lease log at $dir (no entries, yet the first-slot " +
              "claim keeps failing — a pre-log lease file or a permission problem?)")
        case Cur(seq, _, exp) if exp.exists(_ <= now) =>
          // expired (or released sentinel): steal = claim the next slot.
          // Two stealers, or a stealer racing a late renewal, all
          // target seq+1 — exactly one wins, no deletes involved. The
          // winner still CONFIRMS (see confirmedMax): if this steal
          // stalled long enough that seq+1 was claimed, superseded,
          // and GC'd by others, the create lands on a recycled number
          // under a live foreign max — confirmed-or-retired closes
          // that ABA. A FAILED claim here is usually a lost race
          // (loop re-reads), but a persistent failure (quota,
          // permissions) must fail loudly at the deadline, not spin
          // hot forever.
          if (claim(seq + 1, stamp())) confirmClaim(seq + 1, id) match {
            case Confirmed => heldSeq = seq + 1
            case Superseded => retire(seq + 1) // ABA: foreign max — loop
            case Unconfirmable =>
              retire(seq + 1)
              waitOrFail(now, s"steal claim at $dir succeeded but could not be confirmed (listings failing)")
          } else waitOrFail(now,
            s"expired lease at $dir/${entryName(seq)} but the steal claim keeps failing")
        case Cur(seq, _, exp) =>
          // live foreign lease (or torn entry: neither held nor
          // expired — never steal what we cannot judge)
          waitOrFail(now,
            s"writer lease $dir/${entryName(seq)} held by another process" +
              exp.fold(" (entry unparseable — delete it if its writer is known dead)")(
                e => s" (expires $e)"))
        case Unknown =>
          // could not LIST: indistinguishable from a live holder —
          // acting on it (claiming slot 1) could seat two writers
          waitOrFail(now, s"lease log at $dir is unreadable (transient FS errors)")
      }
    }
    gc(heldSeq)
    // renewal daemon: claim a fresh slot every ttl/4 while the op runs.
    // Renewing THROUGH the log means a renewal can never resurrect a
    // stolen lease: if a thief claimed the slot first, our claim fails
    // and the next read shows foreign content — stop for good.
    val renewing = new java.util.concurrent.atomic.AtomicBoolean(true)
    val renewer = new Thread(() => {
      val interval = math.max(50L, ttl / 4)
      while (renewing.get()) {
        try Thread.sleep(interval) catch { case _: InterruptedException => () }
        if (renewing.get()) state() match {
          case Cur(seq, uuid, _) if uuid == id =>
            if (claim(seq + 1, stamp())) confirmClaim(seq + 1, id) match {
              case Confirmed => gc(seq + 1)
              case Superseded =>
                // a thief advanced past us between our read and our
                // claim (our create landed on a recycled GC'd number):
                // positively foreign — same terminal verdict as
                // reading foreign content
                retire(seq + 1)
                renewing.set(false)
              case Unconfirmable =>
                // transient listing failure/lag: our fresh stamp
                // either IS the max (renewal landed, just unreadable
                // right now) or sits superseded under a foreign max as
                // garbage its holder's gc sweeps. Deleting what may be
                // the true max would REGRESS the visible expiry to the
                // previous stamp, and stopping renewal would silently
                // drop mutual exclusion at the stale TTL — do neither;
                // the next tick re-reads and resolves.
                ()
            }
          // claim failed: a thief (after our expiry) or our own release
          // won the slot; the next tick's read resolves which
          case Cur(_, uuid, _) if uuid.nonEmpty =>
            renewing.set(false) // POSITIVELY foreign: stolen, hands off
          case _ =>
            // torn read of the max entry (Cur with empty uuid), no
            // entries, or an unreadable listing: none of these is
            // evidence of theft — concluding "stolen" here would stop
            // renewal for good and silently drop mutual exclusion at
            // TTL for a long op riding out ~200 ms of FS throttling.
            // Retry next tick; only a readable foreign entry stops us.
            ()
        }
      }
    }, s"graft-lease-renew-$k")
    renewer.setDaemon(true)
    renewer.start()
    try body finally {
      renewing.set(false)
      renewer.interrupt()
      renewer.join(10000)
      // release: claim a released sentinel ON TOP of our slot. A
      // renewer thread blocked past the join window may still claim
      // one more slot — each iteration below either lands the sentinel
      // after it or observes a foreign max and stops; the claims are
      // create-arbitrated, so no interleaving wedges the item. Only a
      // POSITIVE foreign/absent observation ends the loop early — a
      // transient read failure (Unknown, or a torn read of our own
      // entry) must retry, not abandon a live lease to its full TTL.
      var done = false
      var tries = 0
      while (!done && tries < 20) {
        tries += 1
        state() match {
          case Cur(seq, uuid, _) if uuid == id =>
            if (claim(seq + 1, "-\n0")) {
              // confirm before sweeping: if the sentinel landed on a
              // recycled GC'd number under a foreign max (the same
              // ABA as acquire), it is harmless superseded garbage —
              // retire it for tidiness; the lease is foreign, which is
              // released-from-our-side either way. UNCONFIRMABLE lets
              // the sentinel STAND: it is either the true max (a
              // correct release) or swept later by the foreign
              // holder's gc — deleting a possibly-true max sentinel
              // would un-release the lease until its TTL.
              confirmClaim(seq + 1, "-") match {
                case Confirmed => gc(seq + 1)
                case Superseded => retire(seq + 1)
                case Unconfirmable => ()
              }
              done = true
            } else if (tries < 20) Thread.sleep(50)
          case Cur(_, uuid, _) if uuid.nonEmpty =>
            done = true // positively foreign: stolen, not ours to release
          case NoLease => done = true // positively gone
          case _ => if (tries < 20) Thread.sleep(50) // Unknown/torn: retry
        }
      }
    }
  }

  /** WRITE-path timezone guard, and only the write path. Bucket
    * labels are rendered at write time by `date_format` ([[withBucket]]),
    * which is codegen'd against the SESSION timezone — the one hot-path
    * expression in the store that cannot be retargeted to the persisted
    * store timezone without demoting the write to a per-row interpreted
    * formatter. So a bucketed WRITE under a drifted session refuses,
    * naming the remedy (receipt: the alternative would silently label
    * rows into wrong buckets — mislabeled data, not just mis-pruning).
    *
    * READS and label-driven maintenance need no such guard: every
    * read-side label ([[query]]'s bucket bounds, [[prunedRoots]],
    * [[prune]]/[[compactBuckets]]'s cutoffs) is rendered by
    * [[bucketLabel]] under the PERSISTED store timezone, and the
    * residual time predicates compare instants — both
    * session-tz-independent, pinned by spec (GraftTableSpec/StoreSpec
    * drifted-session reads return correct rows).
    */
  private def requireTzAligned(): Unit =
    if (bucket.isDefined) {
      val sessionTz = spark.conf.get("spark.sql.session.timeZone")
      if (sessionTz != storeTz)
        throw new SchemaError(
          s"store at $base renders bucket labels under timezone '$storeTz' but " +
            s"the session timezone is '$sessionTz' — bucketed WRITES require " +
            "alignment; set spark.sql.session.timeZone to match (reads are " +
            "timezone-independent and unaffected)"
        )
    }

  /** Add the derived partition column when the store is bucketed. */
  private def withBucket(df: DataFrame): DataFrame =
    bucketFmt.fold(df)(f =>
      df.withColumn(BucketCol, date_format(col(indexName), f)))

  /** The write-side invariants every parquet write of this store must
    * carry — session guards + snappy + the reference 1 M-row chunk
    * contract (store.py:27,174: cap rows per file so row-group stats
    * stay selective without a driver count). [[writer]] adds the bucket
    * column + partitioning on top; [[compactBuckets]] writes single
    * bucket dirs through this directly (the bucket value lives in the
    * dir name, not the files).
    */
  private def flatWriter(df: DataFrame) = {
    requireMicrosTimestamps()
    df.write
      .option("compression", "snappy")
      .option("maxRecordsPerFile", chunkRows)
  }

  private def writer(df: DataFrame) = {
    requireTzAligned() // withBucket's date_format renders in session tz
    val w = flatWriter(withBucket(df))
    bucket.fold(w)(_ => w.partitionBy(BucketCol))
  }

  /** Every store write must run under `spark.sql.parquet.
    * outputTimestampType = TIMESTAMP_MICROS`. The Spark default, INT96,
    * is a legacy type with NO column statistics and no filter pushdown —
    * under it every range query reads every row group of every surviving
    * file, and [[describe]] has no footer min/max. INT64 micros gives
    * both; there is no per-writer option for this (ParquetOptions only
    * covers compression/rebase), so [[Store.open]] pins the session conf
    * once and this guard re-checks it per write — a runtime-mutable conf
    * changed mid-session fails fast instead of landing stat-less files.
    * (A scoped set-and-restore swap per write is NOT safe: two
    * concurrent writes — e.g. a resident [[ingestStream]] racing a batch
    * [[append]] — can interleave set/restore and leave one write running
    * under INT96.) The guard is check-then-write, not atomic: it NARROWS
    * the window to a conf change landing between this check and the
    * parquet action, it cannot close it — post-write footer verification
    * (as StoreSpec does) is the airtight check.
    */
  private def requireMicrosTimestamps(): Unit = {
    val v = spark.conf.getOption(TimestampTypeKey).getOrElse("")
    if (v != "TIMESTAMP_MICROS")
      throw new SchemaError(
        s"store at $base requires $TimestampTypeKey=TIMESTAMP_MICROS " +
          s"(pinned by Store.open; session now has '$v') — INT96 parquet timestamps " +
          "carry no column statistics, so range queries would stop pruning row groups"
      )
  }

  /** Raw read keeping the partition column (for pruning predicates). */
  /** Raw item read, always under the store's OWN schema — never
    * inference. Three reasons: an EMPTY item (a just-created table, a
    * fully-retained-away one) has no footer to infer from and must
    * still read as zero rows of the right shape; inference costs a
    * footer read per query; and on bucketed stores partition-value
    * inference would type a day-format `__bucket` as DATE, when the
    * pruning contract (lexicographic label comparison, [[query]]) is
    * defined on the zero-padded STRING.
    */
  private def loadRaw(key: String): DataFrame = {
    val p = dataPath(key, mustExist = true).toString
    if (bucket.isDefined)
      spark.read.schema(schema.add(BucketCol, StringType)).parquet(p)
    else spark.read.schema(schema).parquet(p)
  }

  /** Sorted listing of the item's current DATA files (full path
    * strings), recursive across bucket dirs, hidden/marker files
    * (`_SUCCESS`, dot-files) excluded. One flat recursive LIST (a
    * paged object-store LIST, not a directory walk) — the metadata
    * backbone of the DSv2 micro-batch stream's offsets
    * ([[graft.sources.v2.GraftMicroBatchStream]]). On a versioned
    * store this resolves the CURRENT version pointer at call time,
    * like every read.
    */
  /** Recursive file listing, shaped per scheme:
    *
    *  - `file://`: a per-directory `listStatus` walk. Same round-trip
    *    count as `fs.listFiles(p, true)` but WITHOUT materializing
    *    `LocatedFileStatus` block locations, which on the local
    *    filesystem cost a per-file metadata probe (measured ~6 ms each
    *    — 0.4 s to list a 61-file item, dominating every metadata-only
    *    op) and carry nothing any caller here uses.
    *  - everything else: `fs.listFiles(p, true)`, because object
    *    stores implement it as ONE flat paged LIST over the key prefix
    *    — a per-directory walk there would pay one round-trip per
    *    bucket directory (10k buckets = 10k LISTs vs ~10 pages).
    */
  /** `rootMustExist = true` (default): a ROOT that does not exist
    * surfaces as FileNotFoundException instead of an empty listing — a
    * caller passing an unchecked root must not read "empty item" where
    * the truth is "no such path" (r16 ADVICE). The vanish-tolerance
    * below is only for CHILDREN disappearing mid-walk (point-in-time
    * snapshot semantics). Callers that walk dirs taken from a fresh
    * listing — which a concurrent vacuum/compaction can legitimately
    * delete before the walk starts — pass `rootMustExist = false`.
    * Strictness costs no extra round-trip: the root's own listStatus /
    * listFiles call already throws FNF when it is missing.
    */
  private def walkFiles(
      root: HPath,
      rootMustExist: Boolean = true): Seq[org.apache.hadoop.fs.FileStatus] = {
    val buf = Vector.newBuilder[org.apache.hadoop.fs.FileStatus]
    if (base.toUri.getScheme == "file") {
      // Every caller applies the Spark hidden-segment filter (`_`/`.`
      // prefixes, `=`-bearing partition dirs exempt), so the walk never
      // needs to ENTER a hidden directory — and must not: a concurrent
      // committer's `_temporary/` task dirs appear and vanish mid-write,
      // and RawLocalFileSystem surfaces a dir deleted between the parent
      // listing and the child listStatus as an opaque
      // IOException("Invalid directory or I/O error occurred") that no
      // message-matching retry can own (found by the widened 25-seed
      // concurrent-torture sweep: describe() in a maintenance thread
      // died walking an appender's task dir). Visible dirs can vanish
      // too (a concurrent prune/compactBuckets deleting a bucket dir),
      // so any child that is GONE on recheck is treated as an empty
      // subtree — the listing is a point-in-time snapshot and callers
      // needing stronger consistency already retry; an I/O error on a
      // dir that still EXISTS stays fatal.
      def hiddenDir(p: HPath): Boolean = {
        val n = p.getName
        (n.startsWith("_") || n.startsWith(".")) && !n.contains("=")
      }
      def go(d: HPath, atRoot: Boolean): Unit = {
        val swallow = !atRoot || !rootMustExist
        val children =
          try fs.listStatus(d)
          catch {
            case _: java.io.FileNotFoundException if swallow =>
              Array.empty[org.apache.hadoop.fs.FileStatus]
            case _: java.io.IOException if swallow && !fs.exists(d) =>
              Array.empty[org.apache.hadoop.fs.FileStatus]
          }
        children.foreach { st =>
          if (st.isDirectory) { if (!hiddenDir(st.getPath)) go(st.getPath, atRoot = false) }
          else buf += st
        }
      }
      go(root, atRoot = true)
    } else {
      val it =
        try fs.listFiles(root, true)
        catch {
          case e: java.io.FileNotFoundException =>
            if (rootMustExist) throw e
            else new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
              def hasNext: Boolean = false
              def next(): org.apache.hadoop.fs.LocatedFileStatus =
                throw new java.util.NoSuchElementException
            }
        }
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) buf += st
      }
    }
    buf.result()
  }

  private[sources] def dataFiles(key: String): Seq[String] = {
    val root = dataPath(key, mustExist = true)
    val rootPrefix = root.toUri.getPath
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    // mustExist above already excludes never-existed roots, so a root
    // missing INSIDE the walk is the vanished-mid-call snapshot race
    // (concurrent compact move-out / drop) — tolerant, like every
    // listing here; a strict root would re-introduce the very
    // throw-on-vanish the point-in-time contract forbids
    walkFiles(root, rootMustExist = false).foreach { st =>
      // hidden-ness applies to EVERY path segment below the item root,
      // not just the file name: a concurrent write's in-flight task
      // files live under a `_temporary/` DIRECTORY with ordinary file
      // names — a name-only filter would stream uncommitted data
      val rel = st.getPath.toUri.getPath.stripPrefix(rootPrefix)
      // Spark's hidden-path rule: `.`-prefixed, or `_`-prefixed UNLESS
      // it is a partition segment (contains '='), which is how the
      // `__bucket=...` dirs stay visible while `_temporary` does not
      val hidden = rel.split('/').exists(seg =>
        seg.startsWith(".") || (seg.startsWith("_") && !seg.contains("=")))
      if (st.isFile && !hidden) buf += st.getPath.toString
    }
    buf.sorted.toSeq
  }

  private def itemPath(key: String, mustExist: Boolean): HPath = {
    val k = validateKey(key)
    val p = new HPath(itemsRoot, k)
    if (mustExist && !fs.exists(p))
      throw new ItemKeyError(s"no such item: $k")
    p
  }

  /** Versioned layout: the item's `_current` pointer object. */
  private def ptrPath(key: String): HPath =
    new HPath(new HPath(itemsRoot, validateKey(key)), Store.CurrentPtr)

  /** Versioned layout: the active version id named by the pointer. */
  private def currentVersion(key: String): String = {
    val ptr = ptrPath(key)
    if (!fs.exists(ptr)) throw new ItemKeyError(s"no such item: ${validateKey(key)}")
    val v = readUTF8(fs, ptr).trim
    // a torn pointer (empty file from a crash between create and write,
    // or naming a vanished dir) would otherwise surface as a baffling
    // FileNotFound deep inside a scan; fail actionably instead —
    // vacuum() repairs the pointer to the newest complete version
    if (v.isEmpty || !fs.exists(new HPath(new HPath(itemsRoot, validateKey(key)), v)))
      throw new java.io.IOException(
        s"item ${validateKey(key)}: version pointer is torn or dangling " +
          s"('$v'); run vacuum() to repair it to the newest complete version")
    v
  }

  /** The directory holding an item's live DATA — the item dir itself on
    * the flat layout, the `_current`-named version dir on the versioned
    * layout. Every read/append/describe resolves through here, so both
    * layouts share all operator code below this point.
    */
  private def dataPath(key: String, mustExist: Boolean): HPath =
    if (!versioned) itemPath(key, mustExist)
    else {
      val k = validateKey(key)
      if (!fs.exists(ptrPath(k))) {
        if (mustExist) throw new ItemKeyError(s"no such item: $k")
        new HPath(itemsRoot, k) // absent: caller only probes existence
      } else new HPath(new HPath(itemsRoot, k), currentVersion(k))
    }

  /** Reference `_validate_key` (store.py:183-194): regex-check, then
    * case-fold to upper for the on-disk directory name.
    */
  def validateKey(key: String): String = key match {
    case KeyRegex() => key.toUpperCase
    case _ => throw new ItemKeyError(s"invalid item key: '$key'")
  }

  def exists(key: String): Boolean =
    if (versioned) fs.exists(ptrPath(key))
    else fs.exists(itemPath(key, mustExist = false))

  def listItems(): Seq[String] =
    if (versioned)
      // an item dir without a pointer is a half-created or half-dropped
      // orphan — not an item (the pointer IS item existence)
      fs.listStatus(itemsRoot).iterator
        .map(_.getPath)
        .filter(p => fs.exists(new HPath(p, Store.CurrentPtr)))
        .map(_.getName).toVector.sorted
    else fs.listStatus(itemsRoot).map(_.getPath.getName).toVector.sorted

  /** Metadata-only item statistics: row count, index min/max, file
    * count and byte size — read from Parquet FOOTERS (row-group counts
    * + column min/max statistics), never the data pages. On a 100 TB
    * item this is O(files) footer reads instead of a full scan, and the
    * footer reads themselves run ON EXECUTORS (parallelize over the
    * file list), so the driver handles only the file listing (one
    * recursive `listFiles` call — a flat paged LIST on object stores,
    * not a directory walk) and the final tiny reduce. The index column
    * is written as INT64 TIMESTAMP(micros) ([[writer]] sets no INT96
    * legacy mode), so footer min/max are epoch-µs longs.
    *
    * Returns (rows, minIndex, maxIndex, nFiles, bytes); min/max are
    * None for an empty item (or if a writer produced no stats).
    */
  /** The PRESENT versions of a versioned item — the current one, plus
    * any orphans a crashed swap left behind (a completed swap deletes
    * its predecessor right after the pointer commit, so extras exist
    * only between a crash and the next [[vacuum]]). Maintenance
    * visibility: an operator can see exactly what `vacuum(0)` would
    * reclaim, and a post-incident read can open a listed orphan as raw
    * parquet (`spark.read.parquet(<item>/<version>)`) before sweeping
    * it. Metadata-only (one listing per version dir). Refuses on the
    * flat layout — there are no versions to report.
    */
  def versionsOf(key: String): Seq[Store.ItemVersion] = {
    if (!versioned)
      throw new SchemaError(
        s"store at $base uses the flat layout — version history exists " +
          "only on versioned stores (Store.open(versioned = true))")
    val k = validateKey(key)
    val cur = currentVersion(k) // throws ItemKeyError when absent
    val itemDir = new HPath(itemsRoot, k)
    fs.listStatus(itemDir).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v-"))
      .map { st =>
        // same segment-wise hidden filter as describe/dataFiles — a
        // name-only .parquet filter would count an in-flight
        // committer's `_temporary/**/part-*.parquet` payload into the
        // version's files/bytes on the fs.listFiles branch, where the
        // walk cannot skip hidden DIRS up front (r16 ADVICE). The
        // version dir itself comes from a point-in-time listing a
        // concurrent vacuum can invalidate → rootMustExist = false.
        val vprefix = st.getPath.toString + "/"
        def hiddenSeg(path: String): Boolean =
          path.stripPrefix(vprefix).split('/').exists(seg =>
            (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("="))
        val files = walkFiles(st.getPath, rootMustExist = false)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet") &&
            !hiddenSeg(f.getPath.toString))
        Store.ItemVersion(
          id = st.getPath.getName,
          current = st.getPath.getName == cur,
          files = files.size.toLong,
          bytes = files.map(_.getLen).sum,
          modifiedMs = st.getModificationTime)
      }
      .sortBy(v => (!v.current, -v.modifiedMs))
  }

  def describe(key: String): Store.ItemStats = {
    val p = dataPath(key, mustExist = true)
    // (path, length) pairs from the single listing — no per-file driver
    // round-trips for sizes (on S3 a per-file getFileStatus would be a
    // HEAD request each). Paths under hidden segments (leading `_` or
    // `.`: committer `_temporary` dirs, `_SUCCESS`-style markers) are
    // excluded exactly as Spark's own file index excludes them — an
    // in-flight append's uncommitted task files are not item data, and
    // they vanish when the committer promotes them (reading their
    // footers would race that rename).
    val prefix = p.toString + "/"
    def hidden(path: String): Boolean =
      path.stripPrefix(prefix).split('/').exists(seg =>
        (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("="))
    // the recursive iterator can throw mid-walk if a concurrent
    // committer removes its _temporary dir between the parent listing
    // and the descent — that's a stale snapshot, not an error, so
    // retake it (bounded; a persistent failure is a real one)
    def listing(): Seq[(String, Long)] =
      // p passed dataPath(mustExist = true): vanish-mid-call is the
      // snapshot race, not a missing item — tolerant root (see dataFiles)
      walkFiles(p, rootMustExist = false).collect {
        case st if st.isFile && st.getPath.getName.endsWith(".parquet") &&
            !hidden(st.getPath.toString) =>
          (st.getPath.toString, st.getLen)
      }
    // "vanished mid-walk" shows up as FileNotFoundException on most
    // FileSystems, but RawLocalFileSystem surfaces it as a
    // RuntimeException from its shelled-out permission probe (`ls`
    // exiting 2 on the removed dir) — match the condition, not the
    // wrapper class
    def vanished(e: Throwable): Boolean = e match {
      case null => false
      case _: java.io.FileNotFoundException => true
      case e => Option(e.getMessage).exists(m =>
        m.contains("No such file or directory") || m.contains("does not exist")) ||
        vanished(e.getCause)
    }
    val files: Seq[(String, Long)] = {
      var tries = 0
      var out: Seq[(String, Long)] = null
      while (out == null) {
        try out = listing()
        catch { case e: Exception if vanished(e) && tries < 5 => tries += 1 }
      }
      out
    }
    val bytes = files.map(_._2).sum
    val idx = indexName
    val paths = files.map(_._1)
    val confEntries = hadoopConfEntries
    val perFile = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { fs =>
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.io.InputFile
        import org.apache.parquet.hadoop.util.HadoopInputFile
        // one Configuration per partition, not per file — construction
        // is measurable at very high file counts. Rebuilt from the
        // DRIVER's effective entries, not `new Configuration()`: a bare
        // one would drop every `spark.hadoop.*`-injected setting (s3a
        // credentials, custom scheme impls) on the executor side.
        val conf = Store.confFrom(confEntries)
        fs.flatMap { f =>
          // a concurrent compact can swap a listed file out between the
          // listing and this footer read; describe is a point-in-time
          // metadata snapshot, so a vanished file contributes nothing
          // rather than failing the whole op
          val r =
            try {
              val in: InputFile = HadoopInputFile.fromPath(
                new org.apache.hadoop.fs.Path(f), conf
              )
              ParquetFileReader.open(in)
            } catch { case _: java.io.FileNotFoundException => null }
          if (r == null) Iterator.empty
          else Iterator.single(try {
            import scala.jdk.CollectionConverters._
            val blocks = r.getFooter.getBlocks.asScala
            var rows = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            blocks.foreach { b =>
              rows += b.getRowCount
              b.getColumns.asScala
                .find(_.getPath.toDotString.equalsIgnoreCase(idx))
                .foreach { c =>
                  val st: org.apache.parquet.column.statistics.Statistics[_] =
                    c.getStatistics
                  if (st != null && !st.isEmpty && st.hasNonNullValue) {
                    (st.genericGetMin, st.genericGetMax) match {
                      case (lo: java.lang.Long, hi: java.lang.Long) =>
                        if (lo < mn) mn = lo
                        if (hi > mx) mx = hi
                      case _ => ()
                    }
                  }
                }
            }
            (rows, mn, mx)
          } finally r.close())
        }
      }
      .collect() // O(files) triples — metadata, not data
    val rows = perFile.map(_._1).sum
    val mins = perFile.map(_._2).filter(_ != Long.MaxValue)
    val maxs = perFile.map(_._3).filter(_ != Long.MinValue)
    Store.ItemStats(
      rows = rows,
      minIndex = mins.minOption.map(Store.microsToTimestamp),
      maxIndex = maxs.maxOption.map(Store.microsToTimestamp),
      files = paths.size.toLong,
      bytes = bytes
    )
  }

  /** Footer aggregates for the DSv2 aggregate-pushdown path (the SQL
    * front door's `SELECT count(*) / min(idx) / max(idx) / count(col)`
    * with no WHERE and no GROUP BY): the same executor-parallel footer
    * sweep [[describe]] runs, but returning everything the scan builder
    * needs to decide EXACTNESS — aggregate pushdown replaces a scan's
    * answer, so a single row-group whose statistics are absent or
    * untrustworthy must veto the pushdown, never silently skew it.
    *
    *  - `rows` is always exact: parquet footers record per-row-group row
    *    counts unconditionally.
    *  - min/max of every INTEGER-FAMILY column (timestamp/date/long/int
    *    — the store's INT64/INT32 physical types, where footer stats
    *    are exact by construction: fixed width, never truncated, no NaN
    *    or comparator hazard; the index is just one of them, its µs
    *    stats guaranteed by the store's own INT64-micros writer) are
    *    exact iff EVERY row-bearing group either carries usable stats
    *    or is provably all-null; otherwise the column leaves
    *    `minMaxExactCols` and the caller must fall back to scanning.
    *    Float/double (NaN ordering) and string/binary (legacy
    *    comparators, possible truncation) never qualify.
    *  - `nonNullCounts` holds `count(col)` answers (SQL count ignores
    *    nulls) for exactly the columns whose null counts every group
    *    records; columns with any unknown group are omitted.
    *
    * Reference lineage: the footer-stat posture of oakstore
    * store.py:255-264 — metadata answers what metadata can, the scan is
    * for everything else.
    */
  private[sources] def footerAgg(key: String): Store.FooterAgg = {
    val paths = dataFiles(key)
    val cols = schema.fieldNames.toSeq
    val mmCols: Set[String] = mmStatCols
    val perFile = sweepFooters(paths, cols, mmCols)
    val rows = perFile.map(_.rows).sum
    val exactNullCols = cols.filter(c => perFile.forall(_.nullCountOkCols.contains(c)))
    val exactMM = mmCols.filter(c => perFile.forall(_.minMaxOkCols.contains(c)))
    val colMinMax = exactMM.flatMap { c =>
      val vs = perFile.flatMap(_.minMaxByCol.get(c))
      if (vs.isEmpty) None // provably all-null: exact, SQL min/max = NULL
      else Some(c -> (vs.map(_._1).min, vs.map(_._2).max))
    }.toMap
    Store.FooterAgg(
      files = perFile.map(t => (t.path, t.rows)).sortBy(_._1).toIndexedSeq,
      rows = rows,
      nonNullCounts = exactNullCols.map(c => c -> perFile.map(_.nonNullByCol(c)).sum).toMap,
      colMinMax = colMinMax,
      minMaxExactCols = exactMM)
  }

  /** The footer sweep shared by [[footerAgg]] and [[footerAggInRange]].
    * Like footerRows: a small file set reads faster on the DRIVER than
    * the scheduling overhead of a cluster job (this sits on the
    * sub-second planning path of SQL count(*)) — threaded, because
    * footer reads are latency-bound (~10-15 ms each even locally, a
    * HEAD+ranged-GET on object stores) and serializing them would hand
    * the job path the win back; a large set fans out over executors so
    * 100k footers never funnel through one machine.
    */
  private def sweepFooters(
      paths: Seq[String], cols: Seq[String], mmCols: Set[String])
      : Array[Store.FileFooterStats] = {
    if (paths.isEmpty) Array.empty
    else if (paths.size <= 256) {
      val conf = spark.sparkContext.hadoopConfiguration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, paths.size))
      try {
        val futures = paths.map { f =>
          pool.submit(new java.util.concurrent.Callable[Store.FileFooterStats] {
            override def call() = Store.fileFooterAgg(conf, f, cols, mmCols)
          })
        }
        futures.map(_.get()).toArray
      } finally pool.shutdown()
    } else {
      val confEntries = hadoopConfEntries
      spark.sparkContext
        .parallelize(paths, math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism)))
        .mapPartitions { fs =>
          val conf = Store.confFrom(confEntries)
          fs.map(f => Store.fileFooterAgg(conf, f, cols, mmCols))
        }
        .collect() // O(files) metadata tuples, not data
    }
  }

  /** Footer-exact aggregate over an INDEX-RANGE slice — the daily-report
    * shape: `SELECT count(*) FROM item WHERE ts >= a AND ts < b`.
    * Bounds are (epoch-µs, inclusive?) pairs so strict and non-strict
    * comparisons both stay exact. The sweep runs over the bucket-PRUNED
    * file set only; each file classifies by its footer min/max of the
    * index:
    *
    *  - fully OUTSIDE the range → contributes nothing;
    *  - fully INSIDE → its non-null-index row count (rows with a NULL
    *    index never satisfy a range predicate, so they are excluded by
    *    construction — which requires the file's index null count to be
    *    footer-known);
    *  - STRADDLING a bound → the answer depends on row-level data the
    *    footer cannot see: the whole aggregation refuses (None) and the
    *    query plans the ordinary scan.
    *
    * min/max/count of NON-index columns are exact only when every
    * included file additionally has ZERO null-index rows (otherwise a
    * value/null could belong to an excluded row); the returned
    * FooterAgg encodes that by dropping non-index columns from its
    * exact sets. An empty included set is exact: zero rows match, so
    * counts are 0 and min/max are NULL. At 100 TB a bucket-aligned
    * range report is O(pruned files) metadata reads instead of a
    * cluster-wide scan — the same footer-stat posture as the unfiltered
    * path (reference lineage: oakstore store.py:255-264).
    */
  /** The fully-inside files of an index-range slice, with their footer
    * stats — or None when any file is unclassifiable (missing index
    * stats) or STRADDLES a bound. Shared by [[footerAggInRange]] and
    * the GROUP-BY face of [[graft.plans.FooterRangeAggregates]]. The
    * SECOND array returns the row-bearing files whose index is provably
    * ALL-NULL (a NULL index satisfies no range predicate, so they never
    * join the included set — but with `lo = hi = None` their rows are
    * real table rows forming SQL's NULL group, and a caller answering
    * an UNFILTERED aggregation must account for them or refuse; see the
    * round-13 ADVICE on the silently-dropped NULL group).
    */
  private[graft] def footerFilesInRange(
      key: String,
      lo: Option[(Long, Boolean)],
      hi: Option[(Long, Boolean)])
      : Option[(Array[Store.FileFooterStats], Array[Store.FileFooterStats])] = {
    val cols = schema.fieldNames.toSeq
    val mmCols: Set[String] = mmStatCols
    // scope the sweep to the bucket-pruned superset (inclusive
    // timestamps are a superset of any strictness)
    val roots = prunedRoots(key,
      lo.map(b => Store.microsToTimestamp(b._1)),
      hi.map(b => Store.microsToTimestamp(b._1)))
    val paths = dataFilesUnder(key, roots)
    val perFile = sweepFooters(paths, cols, mmCols)

    // a value v is in range iff aboveLo(v) && belowHi(v)
    def aboveLo(v: Long): Boolean = lo.forall {
      case (b, incl) => if (incl) v >= b else v > b }
    def belowHi(v: Long): Boolean = hi.forall {
      case (b, incl) => if (incl) v <= b else v < b }

    val idx = indexName
    val included = scala.collection.mutable.ArrayBuffer.empty[Store.FileFooterStats]
    val allNull = scala.collection.mutable.ArrayBuffer.empty[Store.FileFooterStats]
    var unprovable = false
    var i = 0
    while (i < perFile.length && !unprovable) {
      val t = perFile(i)
      if (t.rows > 0L) {
        // the index's stats must be footer-exact to classify at all
        if (!t.nullCountOkCols.contains(idx) || !t.minMaxOkCols.contains(idx))
          unprovable = true
        else if (t.nonNullByCol(idx) > 0L) {
          val (fmin, fmax) = t.minMaxByCol(idx)
          val fullyIn = aboveLo(fmin) && belowHi(fmax)
          val fullyOut = !belowHi(fmin) || !aboveLo(fmax)
          if (fullyIn) included += t
          else if (!fullyOut) unprovable = true // straddles a bound
        }
        // non-null count 0: provably all-null index — no row matches
        // any range predicate, but the rows exist (SQL's NULL group)
        else allNull += t
      }
      i += 1
    }
    if (unprovable) None else Some((included.toArray, allNull.toArray))
  }

  private[graft] def footerAggInRange(
      key: String,
      lo: Option[(Long, Boolean)],
      hi: Option[(Long, Boolean)]): Option[Store.FooterAgg] = {
    val cols = schema.fieldNames.toSeq
    val mmCols: Set[String] = mmStatCols
    val idx = indexName
    // the all-null-index files are correctly invisible here: this path
    // only ever answers an aggregation under a WHERE whose conjuncts
    // are index range / IsNotNull predicates (FooterRangeAggregates
    // .answer unwraps a Filter unconditionally), and a NULL index
    // satisfies none of those — the filter itself excludes those rows
    val inc = footerFilesInRange(key, lo, hi) match {
      case None => return None
      case Some((files, _)) => files
    }
    // count(*) over the slice = non-null-index rows of included files
    val rows = inc.map(_.nonNullByCol(idx)).sum
    // NON-index columns stay exact only when no included file carries
    // null-index rows (their values/nulls could belong to excluded rows)
    val idxClean = inc.forall(t => t.nonNullByCol(idx) == t.rows)
    def keep(c: String): Boolean = c.equalsIgnoreCase(idx) || idxClean
    val exactNullCols =
      cols.filter(c => keep(c) && inc.forall(_.nullCountOkCols.contains(c)))
    val exactMM =
      mmCols.filter(c => keep(c) && inc.forall(_.minMaxOkCols.contains(c)))
    val colMinMax = exactMM.flatMap { c =>
      val vs = inc.flatMap(_.minMaxByCol.get(c))
      if (vs.isEmpty) None // no values in slice: exact, min/max = NULL
      else Some(c -> (vs.map(_._1).min, vs.map(_._2).max))
    }.toMap
    Some(Store.FooterAgg(
      files = inc.map(t => (t.path, t.nonNullByCol(idx))).sortBy(_._1).toIndexedSeq,
      rows = rows,
      nonNullCounts = exactNullCols.map(c => c -> inc.map(_.nonNullByCol(c)).sum).toMap,
      colMinMax = colMinMax,
      minMaxExactCols = exactMM))
  }

  /** The item's data files under the given pruned roots — the same
    * per-segment hidden filter as [[dataFiles]], scoped so metadata
    * sweeps over a range slice pay for the slice, not the item.
    */
  private def dataFilesUnder(key: String, roots: Seq[HPath]): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    roots.foreach { root =>
      val rootPrefix = root.toUri.getPath
      // pruned bucket roots come from a point-in-time listing a
      // concurrent compaction/prune can delete → tolerant root
      walkFiles(root, rootMustExist = false).foreach { st =>
        val rel = st.getPath.toUri.getPath.stripPrefix(rootPrefix)
        val hidden = rel.split('/').exists(seg =>
          seg.startsWith(".") || (seg.startsWith("_") && !seg.contains("=")))
        if (st.isFile && !hidden) buf += st.getPath.toString
      }
    }
    buf.sorted.toSeq
  }

  /** Total DATA bytes under the given roots (pruned bucket dirs, or
    * individual files from a LIMIT prefix) — the planner-facing size
    * estimate behind [[graft.sources.v2.GraftScan]]'s
    * `SupportsReportStatistics`. One listing per directory root (the
    * same hidden-segment filter every read path applies, so an
    * in-flight committer's `_temporary` payload never inflates the
    * estimate), `getFileStatus` per file root. Vanish-tolerant like
    * every listing here: a root deleted mid-walk (concurrent
    * compaction/prune) contributes zero — stats are estimates, the
    * scan itself will surface any real error.
    */
  private[sources] def bytesUnder(roots: Seq[HPath]): Long =
    roots.map { r =>
      try {
        val st = fs.getFileStatus(r)
        if (st.isFile) st.getLen
        else {
          val prefix = r.toString + "/"
          def hidden(path: String): Boolean =
            path.stripPrefix(prefix).split('/').exists(seg =>
              (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("="))
          walkFiles(r).collect {
            case st if st.isFile && st.getPath.getName.endsWith(".parquet") &&
                !hidden(st.getPath.toString) => st.getLen
          }.sum
        }
      } catch { case _: java.io.IOException | _: RuntimeException => 0L }
    }.sum

  /** File prefix that satisfies a pushed LIMIT: walk the item's files in
    * listing order accumulating footer row counts until the limit is
    * covered, so `SELECT * FROM item LIMIT 10` reads one chunk file
    * instead of 100 TB. Driver-side and bounded: at most 64 sequential
    * footer reads (each a tail read, milliseconds) — if the limit isn't
    * covered by then, the remaining files are included UNREAD, which is
    * merely the no-pushdown plan. Exactness never depends on this
    * selection (Spark re-applies the limit; `isPartiallyPushed`), so a
    * file vanishing mid-walk (concurrent compaction) just falls back to
    * the full listing.
    */
  private[sources] def filesForLimit(key: String, limit: Long): Seq[String] = {
    val all = dataFiles(key)
    try {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sparkContext.hadoopConfiguration
      var cum = 0L
      var i = 0
      while (i < all.size && cum < limit && i < 64) {
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(all(i)), conf))
        try cum += r.getRecordCount finally r.close()
        i += 1
      }
      if (cum >= limit) all.take(i) else all
    } catch { case _: java.io.IOException => all }
  }

  /** Groups an item's data files by their `__bucket=` directory and
    * returns them in CHRONOLOGICAL order — or None when the layout is
    * not order-prunable: unbucketed/flat items, fewer than two buckets
    * (no pruning win), any file outside a bucket dir, or any bucket
    * value that isn't the store's zero-padded date shape (this is also
    * what rejects a `__HIVE_DEFAULT_PARTITION__` null-index bucket —
    * rows with a NULL index must veto order pruning, since SQL sorts
    * place them at an end the bucket order knows nothing about).
    * Zero-padded same-length digit/dash labels make lexicographic
    * order chronological regardless of the store timezone (the mapping
    * instant→label is monotone under any fixed tz).
    */
  private def topNBuckets(files: Seq[String])
      : Option[Seq[(String, Seq[String])]] = {
    if (files.isEmpty) return None
    val shaped = files.map { f =>
      val segs = f.split('/')
      if (segs.length < 2) None
      else {
        val parent = segs(segs.length - 2)
        if (!parent.startsWith(BucketCol + "=")) None
        else {
          val v = parent.substring(BucketCol.length + 1)
          if (v.nonEmpty && v.head.isDigit && v.forall(c => c.isDigit || c == '-'))
            Some((v, f))
          else None
        }
      }
    }
    if (shaped.exists(_.isEmpty)) return None
    val byBucket = shaped.flatten.groupBy(_._1)
    if (byBucket.size < 2) return None
    if (byBucket.keys.map(_.length).toSet.size != 1) return None // mixed shapes
    Some(byBucket.toSeq.sortBy(_._1).map { case (b, fs) => (b, fs.map(_._2)) })
  }

  /** Whether a pushed TopN on the index can prune this item at all —
    * the cheap feasibility probe the DSv2 scan builder runs at plan
    * time (one listing, no footer reads).
    */
  private[sources] def orderPrunable(key: String): Boolean =
    topNBuckets(dataFiles(key)).isDefined

  /** Bucket prefix (ASC) / suffix (DESC) whose footer row counts cover
    * a pushed `ORDER BY <index> [DESC] LIMIT k`: bucket dirs partition
    * time, so every excluded file's index values lie strictly beyond
    * every included bucket's range — once the included rows number ≥ k,
    * the true top-k live inside the selection. `SELECT * FROM item
    * ORDER BY ts DESC LIMIT 100` on a 100 TB item reads the newest
    * bucket(s) instead of the corpus. Exactness never depends on the
    * selection (Spark re-sorts and re-limits above the scan —
    * `isPartiallyPushed`), so anything unprovable — non-prunable
    * layout, > 64 footer reads, vanished files, uncovered k — returns
    * the full listing, which is merely the unpruned plan.
    */
  private[sources] def filesForTopN(key: String, k: Long, desc: Boolean): Seq[String] = {
    val all = dataFiles(key)
    topNBuckets(all) match {
      case None => all
      case Some(asc) =>
        val ordered = if (desc) asc.reverse else asc
        try {
          import org.apache.parquet.hadoop.ParquetFileReader
          import org.apache.parquet.hadoop.util.HadoopInputFile
          val conf = spark.sparkContext.hadoopConfiguration
          var cum = 0L
          var reads = 0
          var i = 0
          var overBudget = false
          while (i < ordered.size && cum < k && !overBudget) {
            val bucketFiles = ordered(i)._2
            if (reads + bucketFiles.size > 64) overBudget = true
            else {
              bucketFiles.foreach { f =>
                val r = ParquetFileReader.open(
                  HadoopInputFile.fromPath(new HPath(f), conf))
                try cum += r.getRecordCount finally r.close()
                reads += 1
              }
              i += 1
            }
          }
          if (!overBudget && cum >= k) ordered.take(i).flatMap(_._2) else all
        } catch { case _: java.io.IOException => all }
    }
  }

  /** Schema normalization (reference `_to_internal_type`,
    * store.py:141-174): case-insensitive match of every schema column
    * (missing → [[SchemaError]]), extra columns silently dropped,
    * names uppercased, values cast to the declared types (the reference
    * discards its `astype` result at store.py:168 — a bug; we really
    * cast), index coerced to timestamp, rows range-partitioned + sorted
    * by the index.
    */
  def normalize(df: DataFrame): DataFrame = {
    val byLower: Map[String, String] =
      df.columns.map(c => c.toLowerCase -> c).toMap
    val projected = schema.fields.map { f =>
      val src = byLower.getOrElse(
        f.name.toLowerCase,
        throw new SchemaError(
          s"input is missing required column '${f.name}' " +
            s"(have: ${df.columns.mkString(", ")})"
        )
      )
      val c = col(src)
      val castC =
        if (f.name == indexName) c.cast(TimestampType)
        else c.cast(f.dataType)
      castC.as(f.name)
    }
    df.select(projected.toIndexedSeq: _*)
      .repartitionByRange(col(indexName))
      .sortWithinPartitions(col(indexName))
  }

  /** Initial write — CREATE TABLE AS (reference `_write`,
    * store.py:196-212): fails with [[ItemExistsError]] if the item
    * exists; normalizes; writes snappy Parquet.
    */
  def write(key: String, df: DataFrame): Unit = withItemLock(key) {
    val k = validateKey(key)
    if (exists(k))
      throw new ItemExistsError(s"item $k already exists; use append")
    if (versioned) {
      val id = "v-" + java.util.UUID.randomUUID().toString
      // register the version id like versionSwap does: before the
      // pointer exists every v-dir looks like an orphan, and a
      // concurrent same-JVM vacuum(0) must not sweep the one being
      // written this instant
      Store.activeStagingIds.add(id.stripPrefix("v-"))
      try {
        writer(normalize(df)).mode("errorifexists")
          .parquet(new HPath(new HPath(itemsRoot, k), id).toString)
        // overwrite=false: the loser of a cross-JVM create race gets the
        // same error an errorifexists write would — first pointer wins
        writeUTF8(fs, ptrPath(k), id, overwrite = false)
      } finally Store.activeStagingIds.remove(id.stripPrefix("v-"))
    } else {
      val p = itemPath(key, mustExist = false)
      if (fs.exists(p))
        throw new ItemExistsError(s"item $k already exists; use append")
      // creating a key whose crash markers still pend would make the
      // marker manifests ambiguous (is the new dir this swap's partial
      // promote, or unrelated fresh data?) — recovery's no-clobber
      // guarantee rests on this refusal, so it comes before any write
      requireNoPendingMarkers(k)
      writer(normalize(df)).mode("errorifexists").parquet(p.toString)
    }
  }

  /** CTAS staging, step 1 of 2 (versioned layout only): write a
    * COMPLETE version directory for a not-yet-existing item WITHOUT its
    * pointer. The item stays invisible — the pointer IS existence — so
    * a crash at any later point before [[commitStagedVersion]] leaves
    * only an orphan v-dir for vacuum's sweep, never a visible partial
    * item. The returned id stays registered against same-JVM vacuum(0)
    * until the commit/abort that balances this call.
    */
  def writeStagedVersion(key: String, df: DataFrame): String = withItemLock(key) {
    val k = validateKey(key)
    require(versioned,
      s"writeStagedVersion requires the versioned layout; store at $base is flat")
    if (exists(k))
      throw new ItemExistsError(s"item $k already exists; use append")
    val id = "v-" + java.util.UUID.randomUUID().toString
    Store.activeStagingIds.add(id.stripPrefix("v-"))
    try {
      writer(normalize(df)).mode("errorifexists")
        .parquet(new HPath(new HPath(itemsRoot, k), id).toString)
      id
    } catch {
      case t: Throwable =>
        Store.activeStagingIds.remove(id.stripPrefix("v-"))
        throw t
    }
  }

  /** CTAS staging, step 2: make the staged version THE item — one
    * pointer PUT, atomic on every real backend; overwrite=false makes
    * the loser of a cross-JVM create race fail exactly like an
    * errorifexists write (first pointer wins).
    *
    * The staged dir is re-verified (dir + `_SUCCESS`) immediately
    * before the PUT: the activeStagingIds vacuum guard is same-JVM
    * only, so a vacuum in ANOTHER process whose retention is shorter
    * than this CTAS's insert phase may have swept the pointer-less
    * v-dir as an orphan — committing blind would publish a visible
    * item whose version dir is gone. Failing the CTAS here is the
    * correct outcome (the statement reruns); the residual TOCTOU
    * window between this check and the PUT is the same one
    * versionSwap documents: cross-process vacuum retention MUST
    * exceed the longest in-flight mutation.
    */
  def commitStagedVersion(key: String, id: String): Unit = withItemLock(key) {
    val k = validateKey(key)
    try {
      val vdir = new HPath(new HPath(itemsRoot, k), id)
      // The marker is only evidence where the committer produces one:
      // deployments with mapreduce.fileoutputcommitter.marksuccessfuljobs
      // =false (common on object-store committers) stage complete dirs
      // with no _SUCCESS, and requiring it there would fail EVERY CTAS
      // with a misleading vacuum message. Dir existence is the
      // vacuum-sweep check either way; the marker is the completeness
      // check only when the committer writes markers.
      val marksEnabled = fs.getConf.getBoolean(
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
      if (!fs.exists(vdir))
        throw new IllegalStateException(
          s"staged version $id for item $k is gone " +
            "(swept by a concurrent vacuum with retention shorter than " +
            "the CTAS insert?); the CTAS must be rerun")
      if (marksEnabled && !fs.exists(new HPath(vdir, "_SUCCESS")))
        throw new IllegalStateException(
          s"staged version $id for item $k exists but has no _SUCCESS " +
            "marker while the committer is configured to write one — " +
            "the staged write is incomplete; the CTAS must be rerun")
      Store.writeUTF8(fs, ptrPath(k), id, overwrite = false)
    } finally Store.activeStagingIds.remove(id.stripPrefix("v-"))
  }

  /** CTAS staging abort: delete the orphan version dir. Best-effort —
    * anything left behind is invisible and vacuum-swept.
    */
  def abortStagedVersion(key: String, id: String): Unit = withItemLock(key) {
    val k = validateKey(key)
    try fs.delete(new HPath(new HPath(itemsRoot, k), id), true)
    finally Store.activeStagingIds.remove(id.stripPrefix("v-"))
  }

  /** Staging entries (markers + staged dirs) belonging to `key`,
    * matched EXACTLY: the entry name must be `<KEY><token><id>` for one
    * of the marker tokens — a bare `startsWith(key + ".")` would let
    * key "A" claim key "A.B"'s entries (dots are legal in keys). The
    * tokens themselves are lowercase while on-disk keys are uppercased,
    * so a token can never occur inside a key.
    */
  private def stagingEntries(key: String): Seq[HPath] = {
    val k = validateKey(key)
    if (!fs.exists(stagingRoot)) Seq.empty
    else fs.listStatus(stagingRoot).iterator.map(_.getPath)
      .filter { p =>
        val n = p.getName
        Store.MarkerTokens.exists(t => n.startsWith(k + t))
      }
      .toSeq
  }

  /** The mutation gate shared by every writer entry point: an item
    * whose crash RECOVERY MARKERS (`.swap-`/`.mid-`/`.del-`) still pend
    * is in a HALF-MOVED state — an append could anti-join against the
    * partial live dir and re-insert rows whose only copy sits in trash
    * (duplicated on restore), and a rewrite would make the marker
    * manifests ambiguous. Recovery's correctness rests on mutations
    * being refused until [[vacuum]] finishes the interrupted op.
    *
    * Deliberately NARROWER than [[stagingEntries]]: a markerless
    * `.tmp-`/`.old-` orphan is NOT a half-moved state — the protocol
    * creates the swap marker before the first rename and deletes it
    * only after the live dir is whole again, so an orphan without its
    * marker means the live dir was never touched (a crash inside
    * writeTmp, or debris whose op completed). Blocking on those wedged
    * every later mutation behind one transient job failure until
    * vacuum's age guard; now they are just storage debris for vacuum's
    * orphan sweep.
    */
  private def requireNoPendingMarkers(key: String): Unit = {
    val k = validateKey(key)
    val recovery = Seq(".swap-", ".mid-", ".del-")
    val pending = stagingEntries(k).filter { p =>
      val n = p.getName
      recovery.exists(t => n.startsWith(k + t))
    }
    if (pending.nonEmpty)
      throw new PendingRecoveryError(
        s"item $k has pending crash-recovery state in .staging " +
          "(an interrupted append/compact/drop/prune); run vacuum() " +
          "first — vacuum(0) if no other writer can be live")
  }

  /** Lazy handle: full scan of one item (reference `_Item`,
    * store.py:49-71 — no I/O until an action).
    */
  def apply(key: String): DataFrame =
    loadRaw(key).drop(BucketCol).select(schema.fieldNames.map(col).toIndexedSeq: _*)

  /** Assignment sugar: `store("KEY") = df` — Scala's `update` desugaring
    * mirrors the reference's `store['KEY'] = df` (`__setitem__`,
    * store.py:130-139): initial write if the item is new; the
    * reference's `store[k] += df` no-op-setitem trick (append via
    * `__iadd__` on the same handle) maps to [[item]]`("KEY") += df`.
    */
  def update(key: String, df: DataFrame): Unit = write(key, df)

  /** Mutable-looking handle for the reference's `store[k] += df` append
    * idiom: `store.item("KEY") += df`. Reads stay lazy via [[toDF]];
    * `store.item("KEY")(t0, t1)` mirrors the reference's item slicing
    * `store[k][t0:t1]` (`_Item.__getitem__`, store.py:61-68), including
    * its defaulted bounds (1678-01-01 .. now, via [[sliceCompat]]).
    */
  final class Item private[Store] (key: String) {
    def +=(df: DataFrame): Unit = append(key, df)
    def toDF: DataFrame = Store.this.apply(key)
    def apply(start: Timestamp, end: Timestamp): DataFrame =
      sliceCompat(key, Some(start), Some(end))
    def slice(
        start: Option[Timestamp] = None,
        end: Option[Timestamp] = None
    ): DataFrame = sliceCompat(key, start, end)
  }

  def item(key: String): Item = new Item(validateKey(key))

  /** Exact reference append semantics (`_append`, store.py:214-236):
    * union old+new, drop full-row duplicates with old rows winning
    * (`keep='first'`, store.py:230), rewrite atomically via a temp dir
    * and swap. O(history) per append — kept for small/compat use; the
    * scalable path is [[appendNewOnly]].
    *
    * Documented divergence: the dedup key here is the FULL row including
    * the time index; the reference dedups on value columns only (its
    * `drop_duplicates` runs after `set_index`, store.py:229-230), so two
    * rows with identical values at different times collapse there but
    * are both kept here. The reference behavior loses legitimately
    * repeated observations; ours is the safer contract for a time store.
    */
  def append(key: String, df: DataFrame): Unit = withItemLock(key) {
    if (!exists(key))
      throw new ItemKeyError(
        s"item ${validateKey(key)} does not exist; write it first"
      )
    requireNoPendingMarkers(key)
    val p = dataPath(key, mustExist = true)
    val old = this(key).withColumn("__prov", lit(0))
    val incoming = normalize(df).withColumn("__prov", lit(1))
    // old-wins tie-break: min(__prov) row per full-row key. dropDuplicates
    // keeps an arbitrary row, so order provenance explicitly.
    val valueCols = schema.fieldNames.toIndexedSeq
    val merged = old
      .unionByName(incoming)
      .groupBy(valueCols.map(col): _*)
      .agg(min(col("__prov")).as("__prov"))
      .drop("__prov")
      .repartitionByRange(col(indexName))
      .sortWithinPartitions(col(indexName))
    stagedOverwrite(key, p, merged)
  }

  /** Recursive (relative-path, byte-length) listing of `p` — the
    * manifest a staging marker records. Why it matters: on a raw object
    * store a directory "rename" is a per-object copy followed by a
    * per-object delete, so a crash can leave BOTH endpoints partial-
    * looking — but copy-before-delete guarantees exactly one side is
    * COMPLETE at every crash point. The manifest is how [[vacuum]]
    * tells which: a directory equal to its manifest is intact, a strict
    * subset is partially moved (restorable from the other side), and a
    * directory holding files OUTSIDE the manifest was re-created by a
    * later writer (parquet part names carry fresh UUIDs, so distinct
    * writes can never alias) and must not be touched. Metadata-only:
    * one recursive LIST, no data reads.
    */
  private def manifestOf(p: HPath): Set[(String, Long)] =
    if (!fs.exists(p)) Set.empty
    else {
      val root = p.toUri.getPath
      val b = Set.newBuilder[(String, Long)]
      // the exists() guard above can race a concurrent remover; absent
      // then = absent now = empty manifest, so the root stays tolerant
      walkFiles(p, rootMustExist = false).foreach { f =>
        val rel = f.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
        // DATA files only: Spark-hidden entries (`_`/`.`-prefixed
        // segments; `=`-bearing partition dirs exempt) are excluded —
        // `_SUCCESS` is a constant-name zero-length file present in
        // every parquet dir of every incarnation, so including it
        // would alias across unrelated writes and defeat the
        // "manifests of distinct writes never intersect" property
        val hidden = rel.split("/").exists(s =>
          (s.startsWith("_") || s.startsWith(".")) && !s.contains("="))
        if (!hidden) b += ((rel, f.getLen))
      }
      b.result()
    }

  /** Marker wire format: line 1 the absolute path the marker is about,
    * then one `<bytes>\t<relative path>` line per file. Marker content
    * from older vintages (a bare note, or nothing) parses as an empty
    * manifest, downgrading recovery to the manifest-less protocol.
    */
  private def renderMarker(about: HPath, manifest: Set[(String, Long)]): String =
    (about.toString +: manifest.toSeq.sorted.map { case (r, l) => s"$l\t$r" })
      .mkString("\n")

  private def parseMarker(s: String): (Option[HPath], Set[(String, Long)]) = {
    val lines = s.split("\n").toVector
    val about = lines.headOption
      .filter(l => l.contains("/") && !l.contains("\t"))
      .map(new HPath(_))
    val man = lines.drop(1).iterator.flatMap { line =>
      val i = line.indexOf('\t')
      if (i <= 0) None
      else scala.util.Try(
        (line.substring(i + 1), line.substring(0, i).toLong)).toOption
    }.toSet
    (about, man)
  }

  /** The driver session's effective Hadoop conf as plain entries, for
    * shipping to executor-side metadata readers: a bare
    * `new Configuration()` on an executor loads only the deployment's
    * XML resources and silently drops everything injected via
    * `spark.hadoop.*` (s3a credentials/endpoints, custom scheme impls)
    * — exactly the settings an object-store deployment relies on.
    */
  private[sources] def hadoopConfEntries: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue))
      .toVector
  }

  /** Re-base a marker-recorded absolute path against THIS store's items
    * root. Markers record the swapped/doomed dir at write time; a store
    * relocated between crash and recovery (backup restored elsewhere,
    * mount point moved) must recover into its CURRENT location, not the
    * recorded one. The suffix below the last `/items/` segment
    * identifies the dir in any location (keys are uppercased and marker
    * tokens lowercase, so the literal lowercase segment can only be the
    * layout's own). Paths without one fall back to `dflt`.
    */
  private def rebase(recorded: HPath, dflt: HPath): HPath = {
    val s = recorded.toUri.getPath
    val i = s.lastIndexOf("/items/")
    if (i < 0) dflt
    else {
      val rel = s.substring(i + "/items/".length)
      if (rel.isEmpty) dflt else new HPath(itemsRoot, rel)
    }
  }

  /** Idempotent per-file restore: copy every `expected` file that is
    * absent from (or size-mismatched in) `dst` over from `src`.
    * Re-runnable after any crash point — completeness is judged per
    * file against the manifest, never by whether some move "finished".
    */
  private def copyMissing(
      src: HPath, dst: HPath, expected: Set[(String, Long)]): Unit =
    expected.foreach { case (rel, len) =>
      val d = new HPath(dst, rel)
      val ok = fs.exists(d) && fs.getFileStatus(d).getLen == len
      if (!ok) {
        val in = fs.open(new HPath(src, rel))
        val out = fs.create(d, true)
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, true)
      }
    }

  /** Replace item dir `p` with the (eagerly written) result of `df`,
    * crash-safely, through the FileSystem abstraction. On the versioned
    * layout this is a rename-free pointer swap ([[versionSwap]]); the
    * flat layout below stages OUTSIDE items/ so a half-written
    * directory is never visible to [[listItems]], with a two-marker
    * commit protocol:
    *
    *  1. write new data to `.staging/KEY.tmp-ID`
    *  2. create marker `.staging/KEY.swap-ID`   (intent recorded)
    *  3. rename live -> `.staging/KEY.old-ID`
    *  4. create marker `.staging/KEY.mid-ID`    (old data is out)
    *  5. rename tmp -> live
    *  6. delete old dir, then both markers
    *
    * A crash at any point between steps is recoverable by [[vacuum]]
    * from the marker pair: `swap` without `mid` → the swap never
    * committed → roll BACK; `swap`+`mid` → the old data is already out
    * → roll FORWARD (promote tmp, drop old). Marker names encode
    * key+ID; marker CONTENT carries a file manifest — the swap marker
    * lists the old live dir, the mid marker lists the staged tmp
    * ([[manifestOf]]) — and marker creation is a single
    * create-and-close, visible atomically on object stores too.
    *
    * Atomicity fine print: on HDFS/file: the renames themselves are
    * atomic, so marker-pair recovery alone covers every crash point.
    * On raw object stores (s3a:) a directory "rename" is a per-object
    * copy+delete, and a crash INSIDE step 3/5 leaves a split directory
    * — this is where the manifests close the protocol: copy-before-
    * delete guarantees one complete side at every crash point, and
    * recovery restores or resumes per file against the manifest
    * (roll-back refills a partially-moved live dir from the complete
    * trash copy; roll-forward resumes the promote from tmp), so the
    * item always lands byte-complete on one side of the swap. Files
    * OUTSIDE the manifest are never touched — a post-crash append's
    * rows survive recovery — and clobbering unrelated newer data is
    * structurally impossible: [[write]] refuses to create a key whose
    * crash markers still pend and [[drop]] retires them, so no
    * re-created incarnation can coexist with these markers. For write
    * paths with NO rename at all (the commit primitive raw object
    * stores actually guarantee), use the versioned layout's
    * single-object `_current` pointer swap ([[versionSwap]]).
    */
  private def stagedOverwrite(key: String, p: HPath, df: DataFrame): Unit =
    if (versioned) versionSwap(key, df)
    else stagedOverwriteFlat(key, p, df)

  /** Versioned-layout rewrite: write a fresh immutable version dir,
    * commit it by overwriting the `_current` pointer — ONE single-object
    * PUT, atomic on every real object store, no directory rename
    * anywhere — then best-effort delete the superseded version (a crash
    * before the delete leaves an invisible orphan for [[vacuum]]).
    * A crash before the pointer write leaves readers on the old
    * complete version; there is no intermediate state at all.
    */
  private def versionSwap(key: String, df: DataFrame): Unit = {
    val k = validateKey(key)
    val old = currentVersion(k)
    val id = "v-" + java.util.UUID.randomUUID().toString
    Store.activeStagingIds.add(id.stripPrefix("v-"))
    try {
      writer(df).mode("overwrite")
        .parquet(new HPath(new HPath(itemsRoot, k), id).toString)
      writeUTF8(fs, ptrPath(k), id) // the commit point
      fs.delete(new HPath(new HPath(itemsRoot, k), old), true)
    } finally Store.activeStagingIds.remove(id.stripPrefix("v-"))
  }

  private def stagedOverwriteFlat(key: String, p: HPath, df: DataFrame): Unit =
    stagedSwapFlat(key, p, tmp => writer(df).mode("overwrite").parquet(tmp))

  /** The two-marker swap protocol itself, target-path-generic: `p` may
    * be an item dir (append/compact) or a single bucket dir inside one
    * ([[compactBuckets]]) — the swap/mid markers record `p` in their
    * CONTENT (line 1), and [[vacuum]] recovers against that recorded
    * path, so bucket-level swaps crash-recover exactly like item-level
    * ones. `writeTmp` materializes the replacement into the staged tmp
    * path (parquet write included — it runs INSIDE the in-flight id
    * guard so a concurrent force-vacuum never sweeps a tmp mid-write).
    */
  private def stagedSwapFlat(key: String, p: HPath, writeTmp: String => Unit): Unit = {
    val k = validateKey(key)
    fs.mkdirs(stagingRoot)
    val id = java.util.UUID.randomUUID().toString
    val tmp = new HPath(stagingRoot, s"$k.tmp-$id")
    val swapMarker = new HPath(stagingRoot, s"$k.swap-$id")
    val midMarker = new HPath(stagingRoot, s"$k.mid-$id")
    val trash = new HPath(stagingRoot, s"$k.old-$id")
    Store.activeStagingIds.add(id) // vacuum in this JVM must not touch us
    // true once fs.rename MAY have moved live data: from just before
    // the first rename call — except when that call returned a CLEAN
    // false (the HDFS/file contract: nothing moved). A rename that
    // THREW instead may have partially executed on a copy+delete
    // filesystem, so it keeps the flag.
    var liveTouched = false
    try {
      writeTmp(tmp.toString)
      // swap marker carries the manifest of the OLD live dir, mid
      // marker the manifest of the staged tmp — between them vacuum can
      // reconstruct the intended end state of either move exactly, even
      // where "rename" is a crash-prone per-object copy+delete
      writeUTF8(fs, swapMarker, renderMarker(p, manifestOf(p)))
      liveTouched = true
      if (!fs.rename(p, trash)) {
        liveTouched = false
        throw new java.io.IOException(s"rename $p -> $trash failed")
      }
      writeUTF8(fs, midMarker, renderMarker(p, manifestOf(tmp)))
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"rename $tmp -> $p failed")
      fs.delete(trash, true)
      fs.delete(midMarker, false)
      fs.delete(swapMarker, false)
    } catch {
      case e: Throwable =>
        // a THROWN failure with the live dir still intact — a Spark job
        // failure inside writeTmp (executor OOM, transient FS error), a
        // failed marker write, or a cleanly-refused first rename — is
        // not a half-moved state: retire our own staging debris so one
        // transient error does not wedge the item behind
        // [[PendingRecoveryError]] until vacuum's age guard. Once the
        // first rename may have moved anything, hands off — the markers
        // are exactly what [[vacuum]] recovers from.
        if (!liveTouched) {
          try fs.delete(swapMarker, false) catch { case _: Throwable => () }
          try fs.delete(tmp, true) catch { case _: Throwable => () }
        }
        throw e
    } finally Store.activeStagingIds.remove(id)
  }

  /** Rewrite one item into the canonical layout: range-partitioned and
    * sorted by the time index, files capped at [[chunkRows]] rows.
    * [[appendNewOnly]] trades the reference's O(history) rewrite-per-
    * append for small appended files; at scale those accumulate (more
    * footers to read, weaker row-group stats), and compaction is the
    * periodic maintenance step that restores the 1 M-row sorted-chunk
    * contract (store.py:27,174) without paying it on every append.
    * Atomic: same staged-swap as [[append]].
    */
  def compact(key: String): Unit = withItemLock(key) {
    requireNoPendingMarkers(key)
    val p = dataPath(key, mustExist = true)
    val canonical = this(key)
      .repartitionByRange(col(indexName))
      .sortWithinPartitions(col(indexName))
    stagedOverwrite(key, p, canonical)
  }

  /** The policy that decides WHEN [[compact]] runs: rewrite the item
    * only once [[appendNewOnly]]'s accumulated small files exceed
    * `maxFiles`, using [[describe]]'s footer-only file count — the
    * decision itself reads zero data rows, so calling this after every
    * append batch costs O(files) footer metadata until the threshold
    * trips. Returns true when a compaction ran. Typical loop:
    * `appendNewOnly(k, batch); compactIfNeeded(k)`.
    *
    * Same contract caveat as [[compact]]: a rewrite invalidates any live
    * [[readStream]] tail of this item (freshly-named files would be
    * re-ingested as new input) — run it only between streaming reads, or
    * restart the consumer with a fresh checkpoint after it trips.
    */
  def compactIfNeeded(key: String, maxFiles: Long = 64L): Boolean = {
    require(maxFiles > 0, "maxFiles must be positive")
    val needed = describe(key).files > maxFiles
    if (needed) compact(key)
    needed
  }

  /** Bucket-granular compaction — the 100 TB shape of [[compact]].
    * [[compact]] rewrites the WHOLE item; on a multi-year time-series
    * store that is O(history) I/O to fix small files that only ever
    * accumulate in the buckets appends currently land in. This rewrites
    * ONLY buckets whose data-file count exceeds `maxFilesPerBucket`
    * AND exceeds the canonical count ceil(rows / chunkRows) — the
    * rewrite emits EXACTLY that canonical file count (per-file row
    * capping off for this write, so range-sampling skew cannot split
    * an extra file), which makes `dataFiles == canonicalFiles` an
    * exact fixed point: a bucket too large to ever fit under
    * `maxFilesPerBucket` is rewritten once and then skipped, never
    * re-rewritten forever — each rewrite through the same two-marker
    * crash-safe swap as [[compact]]
    * (the markers record the bucket path; [[vacuum]] finishes an
    * interrupted bucket swap without touching its siblings), so steady-
    * state maintenance cost tracks the append rate, not the item size.
    * Cold buckets are never read OR rewritten — the decision is one
    * LIST per bucket (O(buckets) metadata, zero data rows).
    *
    * Returns the number of buckets rewritten. [[SchemaError]] on
    * non-bucketed stores (use [[compact]]/[[compactIfNeeded]]). On the
    * versioned layout this rewrites inside the current version,
    * in-place like [[prune]] — copying the other 100 TB of buckets
    * into a fresh version to compact one directory would defeat the
    * point. Same [[readStream]] caveat as [[compact]]: a rewrite
    * renames files, so restart streaming tails with a fresh checkpoint
    * after any bucket trips.
    *
    * `since` bounds even the metadata cost: only buckets at or after
    * the bucket containing it are LISTed at all (bucket names are
    * zero-padded, so the cutoff is one string compare per name from
    * the single item-dir listing). A steady-state maintenance loop
    * passes its append horizon here — e.g. yesterday — and the op
    * stops scaling with store age entirely.
    *
    * Cross-vintage caveat: bucket-swap markers are recovered correctly
    * only by binaries that read the marker's recorded path (this
    * vintage onward). In a mixed-version deployment, do not run an
    * OLDER binary's `vacuum()` against a newer writer's crash debris —
    * its recovery assumes item-level swaps and would mis-handle a
    * bucket-level one; recover with the writer's own version first.
    */
  def compactBuckets(
      key: String,
      maxFilesPerBucket: Long = 16L,
      since: Option[Timestamp] = None
  ): Long =
    withItemLock(key) {
      require(maxFilesPerBucket > 0, "maxFilesPerBucket must be positive")
      val fmt = bucketFmt.getOrElse(
        throw new SchemaError(
          s"store at $base is not bucketed; compactBuckets needs directory " +
            "buckets (open with bucket = day|month|year) — use compact()"))
      requireNoPendingMarkers(key)
      val p = dataPath(key, mustExist = true)
      val cutoff = since.map(bucketLabel(fmt, _))
      val buckets = bucketDirs(p)(b => cutoff.forall(b >= _))
      var rewritten = 0L
      buckets.foreach { d =>
        val dataPaths = fs.listStatus(d).iterator
          .filter { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(_.getPath.toString)
          .toVector
        val dataFiles = dataPaths.size
        // convergence guard: a bucket holding more rows than
        // maxFilesPerBucket × chunkRows can never compact below the
        // threshold — without the canonical-count clamp it would be
        // fully rewritten on EVERY maintenance call, forever. Footer
        // row counts (read only for over-threshold buckets, from the
        // SAME listing) bound the target: rewrite only when the bucket
        // holds more files than its rows canonically need.
        lazy val canonicalFiles =
          math.max(1L, (footerRows(dataPaths) + chunkRows - 1) / chunkRows)
        if (dataFiles > maxFilesPerBucket && dataFiles > canonicalFiles) {
          // bucket files store the data columns only (the bucket value
          // lives in the dir name), so the rewrite is a plain parquet
          // round-trip sorted by the index. The partition count is the
          // EXPLICIT canonical file count — letting the planner pick
          // (shuffle.partitions / AQE) emits however many range
          // partitions it advises — and per-file row capping is OFF for
          // this write (maxRecordsPerFile=0): a range partition nudged
          // past chunkRows by sampling skew must not split into an
          // extra file, so the output is EXACTLY canonicalFiles files
          // and the next call's dataFiles == canonicalFiles skips — an
          // exact fixed point, no slack factor scaling debris with
          // bucket size. Files target chunkRows rows ± that skew;
          // row-group stats stay per-group either way.
          val canonical = spark.read.parquet(d.toString)
            .repartitionByRange(
              math.min(canonicalFiles, Int.MaxValue.toLong).toInt,
              col(indexName))
            .sortWithinPartitions(col(indexName))
          stagedSwapFlat(key, d,
            tmp => flatWriter(canonical)
              .option("maxRecordsPerFile", 0L)
              .mode("overwrite").parquet(tmp))
          rewritten += 1
        }
      }
      rewritten
    }

  /** Render `t` as the bucket-directory label under format `fmt` in the
    * store timezone — zero-padded, so string compare = time compare.
    */
  private def bucketLabel(fmt: String, t: Timestamp): String =
    java.time.format.DateTimeFormatter
      .ofPattern(fmt)
      .withZone(java.time.ZoneId.of(storeTz))
      .format(t.toInstant)

  /** Bucket directories of item dir `p` whose label satisfies `pred` —
    * the one shared listing both bucket-granular maintenance ops
    * ([[prune]], [[compactBuckets]]) filter on.
    */
  private def bucketDirs(p: HPath)(pred: String => Boolean): Vector[HPath] =
    fs.listStatus(p).iterator
      .map(_.getPath)
      .filter { d =>
        val n = d.getName
        n.startsWith(BucketCol + "=") && pred(n.stripPrefix(BucketCol + "="))
      }
      .toVector

  /** Exact row count over `paths` from parquet FOOTERS only (the
    * listing comes from the caller — no second LIST of a dir the
    * caller just listed). Driver-side sequential reads up to a few
    * dozen files; past that (exactly the piled-up-small-files state
    * this count exists to diagnose) the footer reads fan out over
    * executors like [[describe]]'s — a 256-small-file bucket must not
    * serialize 256 open/read round-trips on the driver. Executors get
    * the DRIVER's effective conf ([[hadoopConfEntries]]), not a bare
    * `new Configuration()` that would drop `spark.hadoop.*` settings.
    */
  private def footerRows(paths: Seq[String]): Long = {
    def countOne(conf: org.apache.hadoop.conf.Configuration, p: String): Long = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(p), conf))
      try r.getRecordCount finally r.close()
    }
    if (paths.size <= 32) {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.map(countOne(conf, _)).sum
    } else {
      val sc = spark.sparkContext
      val entries = hadoopConfEntries
      sc.parallelize(paths, math.max(1, math.min(paths.size / 8, sc.defaultParallelism)))
        .mapPartitions { it =>
          val conf = Store.confFrom(entries)
          Iterator.single(it.map(countOne(conf, _)).sum)
        }
        .sum().toLong
    }
  }

  /** Scalable append: left-anti join the incoming batch against existing
    * rows and append only genuinely-new files — O(new ⋈ old-overlap)
    * instead of the reference's O(history) rewrite. Equivalent end state
    * to [[append]] (duplicates never written; old rows untouched, so
    * "old wins" trivially holds). The anti-join matches per column with
    * `<=>` (null-safe equality): a plain `usingColumns` join is
    * null-unsafe, so NULL-bearing rows would re-append forever.
    */
  def appendNewOnly(key: String, df: DataFrame): Unit = withItemLock(key) {
    if (!exists(key))
      throw new ItemKeyError(
        s"item ${validateKey(key)} does not exist; write it first"
      )
    requireNoPendingMarkers(key)
    val p = dataPath(key, mustExist = true)
    val incoming = normalize(df).dropDuplicates().as("i")
    val existing = this(key).as("e")
    val cond = schema.fieldNames
      .map(c => col(s"i.$c") <=> col(s"e.$c"))
      .reduce(_ && _)
    val fresh = incoming
      .join(existing, cond, "left_anti")
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // registered so vacuum's job-staging sweep (job 4) never reclaims
    // THIS job's live `_temporary`/`.spark-staging-*` out from under it
    val tag = Store.inPlaceTag(base, validateKey(key))
    Store.activeInPlaceWrites.add(tag)
    try writer(fresh).mode("append").parquet(p.toString)
    finally Store.activeInPlaceWrites.remove(tag)
  }

  /** Drop one item entirely (maintenance op, like [[compact]]):
    * [[ItemKeyError]] if absent. The store itself (schema, other
    * items) is untouched. Crash-safe like every destructive op here:
    * the live directory is first renamed out of items/ into .staging,
    * so a kill mid-delete can never leave a half-deleted item visible
    * to [[listItems]]/[[exists]] — the item is either fully present or
    * fully gone on rename-atomic filesystems, and where rename is a
    * copy+delete, a `KEY.del-ID` intent marker (written first) lets
    * [[vacuum]] finish an interrupted removal exactly.
    */
  def drop(key: String): Unit = withItemLock(key) {
    // dropping an item also retires its crash-recovery debris: any
    // pending markers described a live dir that no longer exists, and
    // leaving them would block [[write]]'s re-creation refusal forever.
    // The item lock excludes same-JVM WRITERS of this key; the vacuum
    // pseudo-lock (which vacuum holds for its whole sweep, taking no
    // item locks) excludes a same-JVM vacuum for the WHOLE drop — not
    // just the marker sweep. Holding it only around the sweep left a
    // window where vacuum, mid-recovery of this key's old markers,
    // could copyMissing stale files back into items/KEY right after
    // our rename moved it out — resurrecting a dropped item with no
    // pending markers left to flag it. Ordering is item-lock →
    // vacuum-lock everywhere, vacuum takes no item locks: no cycle. (A
    // concurrent OTHER-JVM writer racing a drop is already undefined;
    // writerLease serializes that.)
    val vl = Store.lockFor(base, "..vacuum")
    vl.lock()
    try dropLocked(key)
    finally vl.unlock()
  }

  private def dropLocked(key: String): Unit = {
    def sweepStaging(k: String): Unit =
      stagingEntries(k).foreach(p => fs.delete(p, true))
    if (versioned) {
      val k = validateKey(key)
      if (!exists(k)) throw new ItemKeyError(s"no such item: $k")
      // pointer delete IS the atomic disappear; the data tree is
      // invisible debris after it (vacuum also sweeps orphan versions)
      fs.delete(ptrPath(k), false)
      fs.delete(new HPath(itemsRoot, k), true)
      sweepStaging(k)
    } else {
      val p = itemPath(key, mustExist = true)
      fs.mkdirs(stagingRoot)
      val id = java.util.UUID.randomUUID().toString
      val trash = new HPath(stagingRoot, validateKey(key) + ".old-" + id)
      val del = new HPath(stagingRoot, validateKey(key) + ".del-" + id)
      Store.activeStagingIds.add(id)
      try {
        // deletion intent marker (with the doomed dir's manifest): a
        // crash mid-rename on a copy+delete filesystem leaves a partial
        // live dir that the rename-atomic protocol could never see —
        // vacuum finishes the drop from the marker, deleting exactly
        // the manifest's files (a later writer's files are preserved;
        // re-creating the key while markers pend is blocked by
        // [[write]]'s refusal until vacuum or drop clears them)
        writeUTF8(fs, del, renderMarker(p, manifestOf(p)))
        if (!fs.rename(p, trash)) {
          fs.delete(del, false) // clean failure: nothing moved, intent void
          throw new java.io.IOException(s"rename $p -> $trash failed")
        }
        fs.delete(trash, true)
        fs.delete(del, false)
        sweepStaging(validateKey(key))
      } finally Store.activeStagingIds.remove(id)
    }
  }

  /** Retention: drop every time bucket of `key` strictly OLDER than the
    * bucket containing `before` — pure directory deletes, no scan, no
    * rewrite (the other 100 TB housekeeping op next to [[compact]]).
    * Retention is bucket-granular by design: rows inside `before`'s own
    * bucket are kept (removing them would mean rewriting that bucket;
    * run with `before` on a bucket boundary for exact cuts). Bucket
    * names are zero-padded so the lexicographic compare below IS the
    * chronological compare. Crash-safe like [[drop]]: each expired
    * bucket writes a `KEY.del-ID` intent marker and is renamed into
    * .staging before deletion, so a kill mid-prune leaves every bucket
    * either fully present, fully gone, or finished by [[vacuum]].
    *
    * Only valid on bucketed stores ([[SchemaError]] otherwise — a flat
    * item has no sub-scan deletion unit). Returns the number of buckets
    * dropped. On the versioned layout this deletes bucket dirs INSIDE
    * the current version (retention is in-place by design — copying
    * 100 TB minus a bucket into a fresh version to delete a directory
    * would defeat the point); a reader listing mid-prune can observe a
    * bucket disappear, the same contract as the flat layout.
    */
  def prune(key: String, before: Timestamp): Long = withItemLock(key) {
    val fmt = bucketFmt.getOrElse(
      throw new SchemaError(
        s"store at $base is not bucketed; prune needs directory buckets " +
          "(open with bucket = day|month|year)"
      )
    )
    requireNoPendingMarkers(key)
    val p = dataPath(key, mustExist = true)
    val cutoff = bucketLabel(fmt, before)
    fs.mkdirs(stagingRoot)
    val expired: Seq[HPath] = bucketDirs(p)(_ < cutoff)
    expired.foreach { d =>
      val id = java.util.UUID.randomUUID().toString
      val trash = new HPath(stagingRoot, validateKey(key) + ".old-" + id)
      val del = new HPath(stagingRoot, validateKey(key) + ".del-" + id)
      Store.activeStagingIds.add(id)
      try {
        // same deletion-intent marker as [[drop]]: lets vacuum finish a
        // bucket removal whose copy+delete rename died partway
        writeUTF8(fs, del, renderMarker(d, manifestOf(d)))
        if (!fs.rename(d, trash)) {
          fs.delete(del, false)
          throw new java.io.IOException(s"rename $d -> $trash failed")
        }
        fs.delete(trash, true)
        fs.delete(del, false)
      } finally Store.activeStagingIds.remove(id)
    }
    expired.size.toLong
  }

  /** Crash-recovery sweep, finishing the atomicity story of
    * [[append]]/[[compact]]/[[drop]]/[[prune]]. Four jobs:
    *
    *  1. **Swap recovery** — an interrupted [[stagedOverwrite]] leaves
    *     its `KEY.swap-ID` (and possibly `KEY.mid-ID`) marker behind;
    *     the marker pair says exactly how far the swap got (protocol at
    *     [[stagedOverwrite]]). `swap` without `mid`: the swap never
    *     committed → roll BACK — and if the live dir lost files to a
    *     partially-executed copy+delete rename (strict subset of the
    *     swap marker's manifest), refill it per file from the complete
    *     trash copy first. `swap` + `mid`: the old data was already
    *     moved out → roll FORWARD by promoting the staged tmp per file
    *     against the mid marker's manifest (idempotent, resumes partial
    *     promotes) — unless the live dir holds files the manifest never
    *     listed, which means a later writer re-created the item and the
    *     stale swap is swept instead of promoted. Either way the item
    *     ends whole and the markers are cleared.
    *  1b. **Delete recovery** — an interrupted [[drop]]/[[prune]]
    *     leaves its `KEY.del-ID` intent marker; recovery finishes the
    *     delete (leftover live files and the trash copy), guarded by
    *     the same manifest-subset rule so a re-created path is never
    *     touched.
    *  2. **Orphan sweep** — `*.tmp-*` / `*.old-*` dirs whose op died
    *     between its last rename and its delete: invisible to readers
    *     (staging lives outside items/) but occupying storage; swept.
    *     (Job 3, further down in [[vacuumLocked]]: the versioned
    *     layout's orphan-version sweep.)
    *  4. **Job-staging debris sweep** — committer `_temporary` /
    *     `.spark-staging-*` dirs inside a live data dir, left by an
    *     in-place append that died mid-job: hidden from every read but
    *     holding staged bytes nothing else reclaims (`.spark-staging`
    *     names are per-job UUIDs no later job touches). Skips items
    *     with a same-JVM in-place append in flight
    *     ([[Store$.activeInPlaceWrites]]).
    *
    * Two writer-safety layers: entries whose staging id belongs to an
    * op IN FLIGHT IN THIS JVM ([[Store$.activeStagingIds]]) are always
    * skipped — that makes even a force-sweep (`vacuum(0)`) safe against
    * same-driver concurrent appends/compacts — and `olderThanMillis`
    * (modification-time-based) guards against writers in OTHER JVMs,
    * which this process cannot see. The default sweeps only entries
    * older than one hour (longer than any plausible single write);
    * pass 0 only when no out-of-process writer exists. Returns entries
    * removed (markers not counted; a recovered swap counts its data
    * dirs). Vacuums of one store serialize on the item-lock of the
    * pseudo-item `..vacuum` (not a legal item key, so it can never
    * collide with a real item's lock).
    */
  def vacuum(olderThanMillis: Long = 3600000L): Long = {
    require(olderThanMillis >= 0, "olderThanMillis must be >= 0")
    val l = Store.lockFor(base, "..vacuum")
    l.lock()
    try vacuumLocked(olderThanMillis) finally l.unlock()
  }

  private def vacuumLocked(olderThanMillis: Long): Long = {
    val staging = stagingRoot
    val cutoff = System.currentTimeMillis() - olderThanMillis
    // a versioned store with only clean swaps never creates .staging —
    // jobs 1-2 see no entries, but job 3 must still sweep orphan versions
    val entries =
      if (fs.exists(staging)) fs.listStatus(staging).toVector
      else Vector.empty[org.apache.hadoop.fs.FileStatus]
    def inFlight(name: String): Boolean =
      Store.stagingId(name).exists(Store.activeStagingIds.contains)
    var removed = 0L
    // job 1: complete or roll back interrupted swaps, markers first —
    // their tmp/old dirs must not hit the age sweep below mid-recovery
    val swapMarkers = entries.filter { e =>
      val n = e.getPath.getName
      n.contains(".swap-") && e.getModificationTime <= cutoff && !inFlight(n)
    }
    val recovered = scala.collection.mutable.Set[String]()
    // Per-marker vanish-tolerance (both recovery loops): `inFlight` is
    // checked at FILTER time over a listing taken once, so a concurrent
    // same-store maintenance op can COMPLETE its swap/delete — removing
    // its staging id and then its marker — between that check and this
    // loop reaching the marker. A FileNotFoundException on the marker
    // family here therefore means "the owner finished; nothing left to
    // recover for this id" (owners delete their markers last), the same
    // principle as walkFiles' vanished-mid-walk tolerance. Every other
    // failure still propagates: a half-recovered swap must fail loudly.
    swapMarkers.foreach { m =>
      try {
      val n = m.getPath.getName
      val i = n.indexOf(".swap-")
      val k = n.substring(0, i)
      val id = n.substring(i + ".swap-".length)
      val tmp = new HPath(staging, s"$k.tmp-$id")
      val trash = new HPath(staging, s"$k.old-$id")
      val mid = new HPath(staging, s"$k.mid-$id")
      // the swapped dir is recorded in the marker CONTENT (line 1):
      // item-level swaps record items/KEY, bucket-level swaps
      // (compactBuckets) record the bucket dir inside it — recovery
      // targets whichever was swapped, RE-BASED against this store's
      // own items root (see [[rebase]]: the marker records an absolute
      // path, but the store may have been relocated — backup restore,
      // mount move — between crash and recovery, and recovering into
      // the stale original location could orphan or destroy the trash
      // copy). Markers from vintages that predate the recorded path
      // fall back to the item dir.
      def liveOf(markerContent: String): HPath =
        parseMarker(markerContent)._1
          .map(rebase(_, new HPath(itemsRoot, k)))
          .getOrElse(new HPath(itemsRoot, k))
      if (fs.exists(mid)) {
        // old data left items/ before the crash — the swap committed;
        // roll FORWARD. A clobber of unrelated newer data is
        // structurally impossible here: [[write]] refuses to create an
        // item while its crash markers pend and [[drop]] sweeps them,
        // so a live dir coexisting with these markers can only be this
        // swap's partial promote plus (at most) post-crash appends —
        // whose fresh-named files copyMissing leaves untouched.
        val midContent = readUTF8(fs, mid)
        val live = liveOf(midContent)
        val newMan = parseMarker(midContent)._2 // manifest of tmp
        if (newMan.nonEmpty) {
          // manifest-bearing marker: promote per file, idempotently —
          // exact even when the promote itself was a copy+delete rename
          // that died partway (a strict-subset live simply resumes).
          // Defense-in-depth guard: under this binary's write-refusal
          // discipline live can only hold a subset of the manifest
          // here, but a store last written by an UNGATED binary can
          // carry a re-created incarnation next to stale markers
          // (parquet part names bear fresh UUIDs, so its files fall
          // outside the manifest) — promoting into it would mix two
          // unrelated writes. Foreign names in live → sweep the stale
          // staging debris and leave live untouched.
          val liveForeign =
            !manifestOf(live).map(_._1).subsetOf(newMan.map(_._1))
          if (fs.exists(tmp)) {
            if (!liveForeign) copyMissing(tmp, live, newMan)
            fs.delete(tmp, true)
            removed += 1
          }
          if (fs.delete(trash, true)) removed += 1
        } else {
          // legacy manifest-less marker: single-rename promote
          if (fs.exists(tmp)) {
            if (fs.exists(live)) fs.delete(live, true) // partial promote
            if (!fs.rename(tmp, live) && !fs.exists(live))
              throw new java.io.IOException(s"swap recovery: rename $tmp -> $live failed")
            removed += 1
          }
          if (fs.delete(trash, true)) removed += 1
        }
        fs.delete(mid, false)
      } else {
        // the swap never committed (live never fully left items/) —
        // roll BACK. On a copy+delete rename the live dir may have lost
        // files mid-move; copy-before-delete guarantees trash holds a
        // complete copy then — restore the MISSING manifest files per
        // file before sweeping the staging debris. Files outside the
        // manifest are left alone (a post-crash append's rows survive
        // recovery), and the write-refusal/drop-sweep discipline (see
        // roll-forward above) guarantees live is never an unrelated
        // re-created item.
        val swapContent = readUTF8(fs, m.getPath)
        val live = liveOf(swapContent)
        val oldMan = parseMarker(swapContent)._2
        // same ungated-binary guard as roll-forward: a live dir holding
        // names outside the old manifest is a re-created incarnation,
        // not a partial move-out — never copy stale files into it
        val liveForeign = oldMan.nonEmpty &&
          !manifestOf(live).map(_._1).subsetOf(oldMan.map(_._1))
        if (oldMan.nonEmpty && fs.exists(trash) && !liveForeign &&
            !oldMan.subsetOf(manifestOf(live)))
          copyMissing(trash, live, oldMan)
        else if (oldMan.isEmpty && fs.exists(trash)) {
          // legacy manifest-less marker with the complete copy in trash
          // (crash between move-out and mid marker). live absent →
          // whole-dir rename back; live PRESENT but partially moved out
          // → refill the missing files from trash per trash's own
          // listing (without a manifest the trash copy is the only
          // record of what the item held; copy-before-delete guarantees
          // it is complete) — falling through to the sweep here used to
          // destroy the only complete copy.
          if (!fs.exists(live)) {
            if (!fs.rename(trash, live) && !fs.exists(live))
              throw new java.io.IOException(
                s"swap recovery: rename $trash -> $live failed")
          } else copyMissing(trash, live, manifestOf(trash))
        }
        if (fs.delete(tmp, true)) removed += 1
        if (fs.delete(trash, true)) removed += 1
      }
      fs.delete(m.getPath, false)
      recovered ++= Seq(tmp.getName, trash.getName, mid.getName)
      } catch { case _: java.io.FileNotFoundException => () }
    }
    // job 1b: finish interrupted deletes (drop / prune). The del marker
    // records the doomed path and its manifest; recovery deletes
    // exactly the MANIFEST files still present there — files outside
    // the manifest belong to a later writer (a re-created item, or an
    // append that raced the half-executed delete) and are preserved —
    // then removes the dir only once nothing is left in it.
    val delMarkers = entries.filter { e =>
      val n = e.getPath.getName
      n.contains(".del-") && e.getModificationTime <= cutoff && !inFlight(n)
    }
    delMarkers.foreach { m =>
      try {
      val n = m.getPath.getName
      val i = n.indexOf(".del-")
      val k = n.substring(0, i)
      val id = n.substring(i + ".del-".length)
      val trash = new HPath(staging, s"$k.old-$id")
      val (target, man) = parseMarker(readUTF8(fs, m.getPath))
      target.map(t => rebase(t, t)).foreach { t => // relocation-safe, like liveOf
        if (fs.exists(t)) {
          man.foreach { case (rel, _) =>
            val f = new HPath(t, rel)
            if (fs.exists(f)) fs.delete(f, false)
          }
          if (manifestOf(t).isEmpty && fs.delete(t, true)) removed += 1
        }
      }
      if (fs.delete(trash, true)) removed += 1
      fs.delete(m.getPath, false)
      recovered += trash.getName
      } catch { case _: java.io.FileNotFoundException => () }
    }
    // job 2: age-based orphan sweep of unclaimed tmp/old dirs
    entries.foreach { e =>
      val n = e.getPath.getName
      if ((n.contains(".tmp-") || n.contains(".old-")) &&
          !recovered.contains(n) && e.getModificationTime <= cutoff &&
          !inFlight(n) && fs.delete(e.getPath, true))
        removed += 1
    }
    // job 3 (versioned layout): sweep version dirs no pointer names —
    // a versionSwap that crashed before its pointer write (invisible
    // new version) or after it but before the old-version delete
    // (superseded data). Same in-flight + age guards as the flat jobs.
    //
    // Pointer-integrity guard: a pointer file that EXISTS but is torn —
    // empty (a crash between its create and its write, on filesystems
    // where create is visible before close) or naming a vanished dir —
    // must never be read as "no version is current": that would turn
    // the item's entire data set into sweepable orphans. Repair it to
    // the newest COMPLETE version (`_SUCCESS` present) first; if none
    // exists, leave the item entirely alone. A pointer that is ABSENT
    // is different: that item never finished creating (or finished
    // dropping), and its versions are genuine orphans.
    if (versioned && fs.exists(itemsRoot)) {
      fs.listStatus(itemsRoot).foreach { item =>
        val ptr = new HPath(item.getPath, Store.CurrentPtr)
        // check-then-read tolerance: a concurrent drop() in another JVM
        // can delete the pointer between exists and read (same-JVM
        // drops now hold the vacuum lock). Read failure with the
        // pointer GONE is a completed drop — versions are orphans;
        // read failure with the pointer still present is a transient
        // FS error — hands off the whole item this round (sweeping on
        // a failed read could orphan live data).
        val raw: Option[Option[String]] = // None = unreadable, skip item
          if (!fs.exists(ptr)) Some(None)
          else (try Some(readUTF8(fs, ptr).trim) catch { case _: Throwable => None }) match {
            case Some(r) => Some(Some(r))
            case None => if (!fs.exists(ptr)) Some(None) else None
          }
        val current: Option[String] = raw match {
          case None => None // unreadable pointer: skip this item
          case Some(None) => Some("") // no pointer: all versions are orphans
          case Some(Some(r)) if r.nonEmpty &&
              fs.exists(new HPath(item.getPath, r)) => // fresh check, not
            Some(r) // a stale pre-listing snapshot (a swap may commit mid-walk)
          case Some(Some(_)) => // torn pointer: repair, never sweep blind
            // re-list NOW: the version a concurrent swap is committing
            // was created before its pointer write, so a fresh listing
            // sees it; skip the whole item while any of its versions
            // belongs to an op in flight in this JVM (the transiently-
            // truncated pointer of a same-JVM versionSwap overwrite
            // must not be "repaired" backward mid-commit)
            val fresh = fs.listStatus(item.getPath)
              .filter(_.getPath.getName.startsWith("v-"))
            val swapInFlight = fresh.exists(v => Store.activeStagingIds
              .contains(v.getPath.getName.stripPrefix("v-")))
            val complete = fresh.filter(v =>
              fs.exists(new HPath(v.getPath, "_SUCCESS")))
            if (swapInFlight || complete.isEmpty) None // hands off
            else {
              val best = complete.maxBy(_.getModificationTime).getPath.getName
              writeUTF8(fs, ptr, best)
              Some(best)
            }
        }
        current.foreach { cur =>
          fs.listStatus(item.getPath)
            .filter(_.getPath.getName.startsWith("v-")).foreach { v =>
            val n = v.getPath.getName
            if (n != cur && v.getModificationTime <= cutoff &&
                !Store.activeStagingIds.contains(n.stripPrefix("v-"))) {
              // last-instant re-read: a versionSwap that fully
              // committed between our pointer read and this delete has
              // already unregistered its id — the fresh pointer is the
              // only evidence left that n became current. (A swap still
              // BETWEEN its pointer write and its unregister is caught
              // by the in-flight check above.) A read failure here —
              // another JVM's drop deleting the pointer mid-read, or a
              // transient FS error — must not abort the whole vacuum:
              // treat the candidate as current (skip it this round).
              val freshCur =
                try { if (fs.exists(ptr)) readUTF8(fs, ptr).trim else cur }
                catch { case _: Throwable => n }
              if (n != freshCur && fs.delete(v.getPath, true))
                removed += 1
            }
          }
        }
      }
    }
    // job 4 (both layouts): sweep dead JOB-STAGING debris inside live
    // data dirs — the committer `_temporary`/`.spark-staging-<jobId>`
    // dirs an in-place append that died mid-job leaves behind. Readers
    // and metadata never see them (hidden-segment filters), but nothing
    // else reclaims the staging bytes: `_temporary` is only swept by
    // the NEXT successful append's committer (which may never come),
    // and `.spark-staging` names are per-job UUIDs no later job
    // touches — found by the cross-JVM lifecycle fuzz's halt-on-delete
    // arm, which dies exactly at this cleanup point. Same two
    // writer-safety layers as the flat jobs: items with an in-place
    // append IN FLIGHT IN THIS JVM ([[Store$.activeInPlaceWrites]]) are
    // skipped unconditionally, and the age guard covers writers in
    // other JVMs. Torn/absent version pointers are job 3's territory —
    // an unresolvable item is left alone here.
    if (fs.exists(itemsRoot)) {
      fs.listStatus(itemsRoot).filter(_.isDirectory).foreach { item =>
        val k = item.getPath.getName
        val dataDir: HPath =
          if (!versioned) item.getPath
          else (try new HPath(item.getPath, currentVersion(k))
                catch { case _: Throwable => null })
        if (dataDir != null &&
            !Store.activeInPlaceWrites.contains(Store.inPlaceTag(base, k))) {
          val children =
            try fs.listStatus(dataDir).toSeq
            catch { case _: Throwable => Seq.empty } // vanished mid-walk
          children.foreach { st =>
            val n = st.getPath.getName
            if (st.isDirectory &&
                (n == "_temporary" || n.startsWith(".spark-staging")) &&
                st.getModificationTime <= cutoff &&
                fs.delete(st.getPath, true))
              removed += 1
          }
        }
      }
    }
    removed
  }

  /** Streaming ingestion into one item — the 24/7 form of the
    * reference's incremental `store[k] += df` loop (store.py:57-59):
    * every micro-batch lands through [[appendNewOnly]]. That makes the
    * sink IDEMPOTENT at the row level: after a crash between a batch
    * landing and its checkpoint commit, the replayed batch anti-joins
    * to nothing and appends zero files — effectively-once end-to-end
    * without a transactional sink, at any scale the anti-join handles.
    * First batch auto-creates the item if absent (same crash window:
    * a replayed creation batch dedups to a no-op).
    *
    * Returns the started [[org.apache.spark.sql.streaming.StreamingQuery]];
    * callers own its lifecycle. Default trigger drains what's available
    * and stops (batch-style backfill); pass a processing-time trigger
    * for a resident stream. Checkpoint location is required — that is
    * what makes restarts resume instead of re-reading history.
    */
  def ingestStream(
      key: String,
      source: DataFrame,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    validateKey(key)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!exists(key)) write(key, batch) else appendNewOnly(key, batch)
      }
      .start()
  }

  /** Streaming tail-read of one item: every Parquet file appended to the
    * item after the stream starts becomes a micro-batch — the streaming
    * analogue of re-running `store[k][t0:]` forever, and the natural
    * consumer of [[appendNewOnly]]'s incremental files. Schema is the
    * store schema (bucket column hidden); pair with a watermark on the
    * index column for windowed aggregation downstream.
    *
    * CONTRACT: valid producers while a stream is live are [[write]] and
    * [[appendNewOnly]] (append-only files). [[append]] and [[compact]]
    * (including [[compactIfNeeded]] when it trips) REWRITE the item
    * into freshly-named files — a file source would
    * re-ingest the full history as new input (double-counting), and the
    * atomic swap briefly unlinks the path. [[prune]] DELETES bucket
    * directories — safe only once the stream has processed past them
    * (the source never re-reads processed files; an unprocessed deleted
    * file fails the batch). After a rewrite (or an unsafe prune),
    * restart the stream with a fresh checkpoint.
    */
  def readStream(key: String): DataFrame = {
    val p = dataPath(key, mustExist = true)
    // recursiveFileLookup descends into __bucket=... directories; the
    // bucket value is directory metadata, not file content, so the
    // store schema (which never includes it) is the file schema
    spark.readStream
      .schema(schema)
      .option("recursiveFileLookup", "true")
      .parquet(p.toString)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Inclusive time-range scan (reference `_query`, store.py:238-267):
    * bounds inclusive on BOTH ends; Catalyst pushes the predicates to
    * Parquet row-group stats (the reference passes explicit pyarrow
    * filters, store.py:255-264). `None` bounds = unbounded — the
    * reference's non-deterministic `datetime.now()` upper default
    * (store.py:253) lives only in [[sliceCompat]].
    */
  /** @param columns optional projection (case-insensitive names from
    *   the store schema; unknown names → [[SchemaError]]). The pruned
    *   column set reaches the Parquet scan's ReadSchema, so a 2-column
    *   read of a wide store only decodes 2 columns — at 100 TB the
    *   difference between a column-pruned scan and a full-width one is
    *   the whole game (asserted in StoreSpec).
    */
  def query(
      key: String,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None,
      columns: Option[Seq[String]] = None
  ): DataFrame = {
    val outCols = columns.fold(schema.fieldNames.toSeq) { cs =>
      cs.map { c =>
        schema.fieldNames
          .find(_.equalsIgnoreCase(c))
          .getOrElse(throw new SchemaError(
            s"unknown column '$c' (have: ${schema.fieldNames.mkString(", ")})"))
      }
    }
    val df = loadRaw(key)
    val idx = col(indexName)
    // directory-level pruning first (bucketed stores): the bucket format
    // is lexicographically ordered, so the time range maps to a string
    // range on the partition column and Spark prunes whole directories.
    // The bounds are rendered under the PERSISTED store timezone (same
    // zone the labels were written in) and the residual ts predicates
    // compare instants, so reads are correct under ANY session
    // timezone — only writes require alignment ([[requireTzAligned]]).
    val bucketPreds = bucketFmt.toSeq.flatMap { f =>
      val fmt = java.time.format.DateTimeFormatter.ofPattern(f)
        .withZone(java.time.ZoneId.of(storeTz))
      start.map(s => col(BucketCol) >= fmt.format(s.toInstant)).toSeq ++
        end.map(e => col(BucketCol) <= fmt.format(e.toInstant)).toSeq
    }
    // row-group pruning + residual exactness (reference store.py:255-266)
    val tsPreds = start.map(s => idx >= lit(s)).toSeq ++ end.map(e => idx <= lit(e)).toSeq
    val preds = bucketPreds ++ tsPreds
    preds.reduceOption(_ && _).map(df.filter).getOrElse(df)
      .drop(BucketCol)
      .select(outCols.map(col).toIndexedSeq: _*)
  }

  /** Directory roots a time-range read of `key` must scan — the
    * pruning decision of [[query]] exposed as metadata, for consumers
    * that assemble their own scan (the DataSource V2 provider,
    * [[graft.sources.v2.GraftDataSource]]). On a bucketed store this
    * is the list of bucket directories whose zero-padded label falls
    * inside the range (ALL bucket dirs when unbounded — returning the
    * item dir instead would re-expose the internal `__bucket` column
    * through partition discovery); on an unbucketed store, the item
    * data dir. Bounds are inclusive, mirroring [[query]]; one
    * directory LIST, no data I/O. Returns an empty seq when no bucket
    * matches (an empty relation, not an error).
    */
  private[sources] def prunedRoots(
      key: String,
      start: Option[Timestamp],
      end: Option[Timestamp]
  ): Seq[HPath] = {
    val p = dataPath(key, mustExist = true)
    bucketFmt match {
      case Some(f) =>
        val lo = start.map(bucketLabel(f, _))
        val hi = end.map(bucketLabel(f, _))
        bucketDirs(p)(b => lo.forall(b >= _) && hi.forall(b <= _))
      case None => Seq(p)
    }
  }

  /** Multi-key union read (at-scale extension; the reference reads one
    * key per call — store.py:238). Returns the union of `query(k, …)`
    * over the resolved, deduplicated keys with an `ITEM` column naming
    * each row's origin, so a portfolio-style range read is ONE Spark
    * job over N pruned scans (directory + row-group pruning applies per
    * branch exactly as in [[query]]) instead of N driver round-trips.
    * Rejects stores whose schema already carries an `ITEM` column — the
    * origin column would silently duplicate the name otherwise.
    */
  def queryMany(
      keys: Seq[String],
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None,
      columns: Option[Seq[String]] = None
  ): DataFrame = {
    if (schema.fieldNames.contains("ITEM"))
      throw new SchemaError(
        "queryMany adds an ITEM origin column but the store schema already has " +
          "a column named ITEM; query the keys individually instead")
    val resolved = keys.map(validateKey).distinct
    if (resolved.isEmpty)
      throw new SchemaError("queryMany requires at least one key")
    resolved
      .map { k =>
        val df = query(k, start, end, columns)
        df.select(lit(k).as("ITEM") +: df.columns.map(col).toIndexedSeq: _*)
      }
      .reduce(_.unionByName(_))
  }

  /** Reference-default bounds: start=1678-01-01 (store.py:250-251),
    * end=now (store.py:252-253) — future-dated rows invisible, as
    * asserted by the reference's tests (tests/test_store.py:62).
    */
  def sliceCompat(
      key: String,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None
  ): DataFrame =
    query(
      key,
      Some(start.getOrElse(MinStart)),
      Some(end.getOrElse(new Timestamp(System.currentTimeMillis())))
    )
}
