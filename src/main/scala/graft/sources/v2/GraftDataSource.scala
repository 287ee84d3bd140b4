package graft.sources.v2

import graft.sources.{SchemaError, Store}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder => V2SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** SQL/catalog front door for Store items: a DataSource V2 table
  * provider registered as format `graft`, so ANY Spark binding — SQL,
  * Python, R — can read an item as a table with the same pruning the
  * Scala `store.query(...)` helper applies:
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("item", "EVENTS").load("/path/to/store")
  *
  *   CREATE TABLE events USING graft
  *     OPTIONS (path '/path/to/store', item 'EVENTS');
  *   SELECT * FROM events WHERE TS BETWEEN '...' AND '...';
  * }}}
  *
  * Why it exists: reading the item's parquet directory directly
  * (`spark.read.parquet(itemPath)`) silently loses bucket-directory
  * pruning — the range predicate is on the TIME column, while the
  * directories are named by the derived `__bucket` string only
  * `Store.query` knew to translate into. This provider does that
  * translation inside the Spark pushdown contract: range filters on
  * the index column reach [[GraftScanBuilder]] via
  * `SupportsPushDownFilters`, are mapped to the store's zero-padded
  * bucket-label range, and the scan is assembled over ONLY the
  * matching bucket directories (plus the same filters pushed on to
  * parquet row-group stats) — `SELECT … WHERE ts BETWEEN` prunes
  * directories before any file I/O, exactly like `store.query`
  * (`Store.scala` query/prunedRoots; reference contract
  * oakstore/store.py:255-264 generalized to the SQL surface).
  *
  * Writes: `INSERT INTO` is supported with the store's `+=` contract
  * (see [[GraftTable]] — appendNewOnly, idempotent re-runs, creation
  * on first insert, a `writerLease` option for leased deployments).
  * Everything more destructive — INSERT OVERWRITE, compaction,
  * retention, drop — stays behind the Store API, whose staged-swap /
  * lease semantics SQL cannot express.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def spark: SparkSession = SparkSession.active

  private def basePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    if (p == null || p.isEmpty)
      throw new SchemaError(
        "graft source requires a store path: .load(\"/store\") or OPTIONS (path '/store')")
    p
  }

  private def itemKey(options: CaseInsensitiveStringMap): String = {
    val k = options.get("item")
    if (k == null || k.isEmpty)
      throw new SchemaError(
        "graft source requires an item key: .option(\"item\", \"EVENTS\") " +
          "or OPTIONS (item 'EVENTS')")
    k
  }

  /** One attach per (path, lease) per provider instance: Spark calls
    * inferSchema and then getTable on the SAME provider for one read,
    * and each attach is several metadata round-trips (schema + layout +
    * marker probes) — measurable latency per query on an object store.
    * The memo is per-READ, not long-lived (providers are created per
    * load), so a store's persisted metadata is still re-read by the
    * next query.
    */
  private val attached =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), Store]()
  private def attachOnce(options: CaseInsensitiveStringMap): Store = {
    val lease = options.getBoolean("writerLease", false)
    attached.computeIfAbsent((basePath(options), lease),
      { case (p, l) => Store.attach(spark, p, writerLease = l) })
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val store = attachOnce(options)
    store.validateKey(itemKey(options)) // fail fast on an invalid key
    store.schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val store = attachOnce(options)
    val key = store.validateKey(itemKey(options))
    // a catalog-persisted schema (CREATE TABLE round-trip) must agree
    // with the store's source of truth — a store whose schema changed
    // out from under the catalog entry fails loudly, never reads
    // misaligned columns
    if (schema != null && schema.length > 0 && schema.json != store.schema.json)
      throw new SchemaError(
        s"table schema ${schema.catalogString} does not match the store's " +
          s"persisted schema ${store.schema.catalogString} at ${basePath(options)}")
    new GraftTable(store, key)
  }
}

/** One Store item as a DSv2 table. Existence is checked lazily at scan
  * build (the catalog may hold entries for items created later).
  *
  * Writes: `INSERT INTO` carries the reference's `store[k] += df`
  * semantics — [[Store.appendNewOnly]] (creation on first insert, like
  * [[Store.ingestStream]]'s first batch), so re-running the same INSERT
  * appends ZERO rows instead of duplicating; SQL users get the store's
  * dedup contract, not blind file appends. Implemented through the V1
  * write bridge (`V1Write` → `InsertableRelation`): the insert arrives
  * as one driver-side DataFrame, exactly what the append path wants —
  * the distribution happens inside appendNewOnly's anti-join, and the
  * write inherits the store's staged-swap/lease machinery for free.
  * `INSERT OVERWRITE` is refused: the destructive rewrite has richer
  * semantics (drop + write) that belong behind the Store API.
  *
  * Timestamp encoding: the first INSERT that finds the session off
  * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` pins it
  * there — session-wide, like [[Store.open]] — and logs a WARNING
  * saying so (that is what gives store files their pruning
  * statistics). Not a scoped set/restore: a restore racing a
  * concurrent write can land stat-less INT96 store files after the
  * per-write guard passed, which is silent data degradation; a
  * visible, warned, permanent pin is the safe shape.
  *
  * Multi-driver deployments where writers lease
  * (`Store.open(writerLease = true)`): pass the `writerLease` table
  * option (`OPTIONS (..., writerLease 'true')`) so SQL INSERTs take
  * the same cross-JVM lease — without it an INSERT mutates under only
  * the in-JVM item lock.
  */
class GraftTable(private[graft] val store: Store, private[graft] val key: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft.`${store.base}`.$key"
  override def schema(): StructType = store.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(store, key, options)

  /** Batch INSERT rides the V1 bridge (the driver-side frame is exactly
    * what appendNewOnly wants); streaming writes are the public DSv2
    * [[GraftStreamingWrite]] (executor-staged parquet + driver-side
    * idempotent ingest). Complete/Update output modes surface here as
    * truncate(), refused by contract.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder =
        throw new SchemaError(
          s"graft sink supports Append output mode only — the ingest " +
            s"contract is appendNewOnly; Complete/Update would truncate " +
            s"item $key (a destructive rewrite belongs to the Store API)")
      override def build(): org.apache.spark.sql.connector.write.Write =
        new V1Write {
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new GraftStreamingWrite(store, key, info.schema(), info.queryId())
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(
                  data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                if (overwrite)
                  throw new SchemaError(
                    s"INSERT OVERWRITE is not supported on graft item $key — " +
                      "a destructive rewrite is drop() + write() through the Store API")
                // the provider attaches read-only (no session conf
                // pinned); an INSERT is a WRITE entry point, so the
                // micros-timestamp invariant must hold. Pin it like
                // Store.open does — session-wide, ONCE, with a
                // logged warning when it actually changes something —
                // NOT a scoped set/restore: a restore racing a
                // concurrent write (another INSERT, a resident
                // ingestStream) can land stat-less INT96 files after
                // the guard passed, the exact interleaving
                // requireMicrosTimestamps' scaladoc declares unsafe.
                // The warning gives the SQL-only user the visibility
                // the old silent repoint lacked.
                Store.pinMicros(data.sparkSession, s"graft INSERT into $key")
                // the store's OWN session too: appendNewOnly validates
                // requireMicrosTimestamps against store.spark, which
                // can be a DIFFERENT session than the INSERT's in a
                // multi-session JVM (catalog CTAS pins both for the
                // same reason) — pinning only the data session fails
                // the write with the misleading "pinned by Store.open"
                // error this pin exists to prevent
                Store.pinMicros(store.spark, s"graft INSERT into $key")
                if (store.exists(key)) store.appendNewOnly(key, data)
                else store.write(key, data)
              }
            }
        }
    }
}

/** Pushdown → pruning translation. `pushFilters` keeps every filter as
  * a residual (Spark re-applies them after the scan — bucket pruning
  * and row-group stats are PERFORMANCE layers, exactness never depends
  * on them), while the accepted set drives two scan-time decisions:
  *
  *  - index-column range bounds → bucket-directory pruning
  *    ([[Store.prunedRoots]]): the scan's file index is built over only
  *    the matching bucket dirs, so out-of-range directories are never
  *    even LISTed for files;
  *  - the same filters ride into the parquet scan's `pushedFilters`,
  *    where row-group min/max stats skip non-matching groups inside
  *    the surviving files (the store writes INT64-micros timestamps
  *    precisely so these stats exist).
  *
  * Column pruning (`SupportsPushDownRequiredColumns`) flows into the
  * parquet ReadSchema — a 2-column projection of a wide item decodes 2
  * columns. The heavy lifting — vectorized parquet reading, whole-stage
  * codegen compatibility, split planning — is delegated to Spark's own
  * [[ParquetScan]], assembled over the pruned file index: this provider
  * adds knowledge, not a reader.
  */
class GraftScanBuilder(store: Store, key: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = store.schema
  private var aggScan: Option[GraftAggScan] = None
  private var limit: Option[Int] = None
  private var topN: Option[(Int, Boolean)] = None // (k, descending)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: Spark re-applies, pushdown is never load-bearing
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: answer count/min/max from parquet footers ----

  /** The footer sweep runs at most once per scan build, shared by
    * `supportCompletePushDown` and `pushAggregation` (Spark calls both
    * with the same Aggregation). Keyed by toString, NOT the record
    * itself: Aggregation is a Java record over ARRAYS, so its equals is
    * reference-based and a fresh-but-identical instance would miss.
    */
  private var evalCache: Option[(String, Option[GraftAggScan])] = None

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames().length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }

  /** Accept `count(*)`, `count(col)` and `min/max(<integer-family
    * col>)` (timestamp/date/long/int — INT64/INT32 physical, whose
    * footer stats are exact by construction; the index is just one of
    * them) with no GROUP BY, and ONLY when the footer statistics prove
    * the answer exact: row counts always are; a `count(col)` needs
    * every row group's null count; `min/max(col)` need every
    * row-bearing group to carry usable stats (or be provably all-null
    * — SQL min/max ignore nulls). This builder answers the FILTERLESS
    * shapes ([[Store.footerAgg]]); the INDEX-RANGE shapes — the
    * daily-report `count(*) WHERE ts >= a AND ts < b` — are answered
    * by the [[graft.plans.FooterRangeAggregates]] optimizer rule via
    * [[Store.footerAggInRange]], because Spark never offers an
    * aggregation to a scan whose filters stayed residual (ours always
    * do). Float/double (parquet stats
    * omit NaN, Spark orders NaN highest) and string/binary (legacy
    * comparators, truncation) never qualify. Anything short of proof
    * returns None and the query plans the ordinary scan — pushdown is
    * an optimization, exactness never depends on it. At 100 TB this is
    * the difference between an O(pruned-files) metadata sweep and a
    * cluster-wide scan (reference posture: oakstore store.py:255-264).
    */
  private def evalAggregation(agg: Aggregation): Option[GraftAggScan] = {
    // CONTENT key, not agg.toString: Aggregation is a Java record over
    // arrays whose generated toString renders the array components by
    // identity hash — a fresh-but-identical instance would never hit
    // the cache (extra footer sweep), and a recycled identity hash
    // could in principle serve a stale wrong answer
    val keyStr = (agg.aggregateExpressions().map(_.describe()) ++
      agg.groupByExpressions().map(_.describe())).mkString("aggs[", ";", "]")
    evalCache match {
      case Some((a, r)) if a == keyStr => return r
      case _ => ()
    }
    val result = computeAggregation(agg)
    evalCache = Some((keyStr, result))
    result
  }

  /** The ONE shared trusted-footer-min/max type predicate
    * ([[graft.sources.Store.footerMinMaxTrusted]] — see its scaladoc
    * for the integer-exactness / NaN-proof / string-refusal
    * discipline).
    */
  private def mmSupported(dt: org.apache.spark.sql.types.DataType): Boolean =
    Store.footerMinMaxTrusted(dt)

  private def computeAggregation(agg: Aggregation): Option[GraftAggScan] = {
    // pushed.nonEmpty cannot actually reach here — Spark only offers an
    // aggregation when no post-scan filter remains, and this builder
    // declares every filter residual. The FILTERED shapes (index-range
    // reports like `count(*) WHERE ts >= a AND ts < b`) are answered one
    // level up by graft.plans.FooterRangeAggregates, which sees the
    // whole Aggregate-Filter-relation tree; refusing here is defense in
    // depth against a future Spark offering the combination.
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    if (!store.exists(key)) return None
    def field(col: String): Option[StructField] =
      store.schema.fields.find(_.name.equalsIgnoreCase(col))
    // shape check first — only a supportable aggregation pays the
    // (cheap, but nonzero) footer sweep
    sealed trait P
    case object CntStar extends P
    case class CntCol(raw: String, f: StructField) extends P
    case class MinCol(raw: String, f: StructField) extends P
    case class MaxCol(raw: String, f: StructField) extends P
    val plan: Option[Seq[P]] = {
      val ps = agg.aggregateExpressions().toSeq.map {
        case _: CountStar => Some(CntStar)
        case c: Count if !c.isDistinct =>
          colOf(c.column).flatMap(n => field(n).map(f => CntCol(n, f)))
        case m: Min => colOf(m.column).flatMap(n =>
          field(n).filter(f => mmSupported(f.dataType)).map(f => MinCol(n, f)))
        case m: Max => colOf(m.column).flatMap(n =>
          field(n).filter(f => mmSupported(f.dataType)).map(f => MaxCol(n, f)))
        case _ => None
      }
      if (ps.forall(_.isDefined)) Some(ps.flatten) else None
    }
    plan.flatMap { ps =>
      // vanish tolerance, like filesForLimit/filesForTopN/bytesUnder: a
      // file deleted between listing and footer read (concurrent
      // compact/prune swap) must degrade to the ordinary scan — which
      // re-lists and never sees the removed file — not fail the whole
      // query at plan time
      val statsOpt =
        try Some(store.footerAgg(key))
        catch { case _: java.io.IOException => None }
      statsOpt.flatMap { stats =>
      // footerAgg normalizes INT32 stats to Long and float/double to
      // the order-preserving sortable-bits encoding; render back to the
      // column's InternalRow representation (Int for int/date, Long
      // for long/timestamp-µs, decoded IEEE for float/double)
      def render(f: StructField, v: Long): Any = f.dataType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => java.lang.Integer.valueOf(v.toInt)
        case org.apache.spark.sql.types.DoubleType =>
          java.lang.Double.valueOf(Store.sortableBitsToDouble(v))
        case org.apache.spark.sql.types.FloatType =>
          java.lang.Float.valueOf(Store.sortableBitsToDouble(v).toFloat)
        case _ => java.lang.Long.valueOf(v)
      }
      val answered = ps.map {
        case CntStar =>
          Some((StructField("count(*)", LongType, nullable = false),
            java.lang.Long.valueOf(stats.rows): Any))
        case CntCol(raw, f) =>
          stats.nonNullCounts.get(f.name).map(n =>
            (StructField(s"count($raw)", LongType, nullable = false),
              java.lang.Long.valueOf(n): Any))
        case MinCol(raw, f) if stats.minMaxExactCols.contains(f.name) =>
          Some((StructField(s"min($raw)", f.dataType),
            stats.colMinMax.get(f.name).map(v => render(f, v._1)).orNull: Any))
        case MaxCol(raw, f) if stats.minMaxExactCols.contains(f.name) =>
          Some((StructField(s"max($raw)", f.dataType),
            stats.colMinMax.get(f.name).map(v => render(f, v._2)).orNull: Any))
        case _ => None
      }
      if (answered.exists(_.isEmpty)) None // some stat unprovable → scan
      else {
        val fields = answered.flatten
        Some(new GraftAggScan(
          StructType(fields.map(_._1)),
          new GenericInternalRow(fields.map(_._2).toArray),
          s"item=$key store=${store.base} " +
            s"pushedAggregates=[${agg.aggregateExpressions().mkString(", ")}]"))
      }
      }
    }
  }

  /** True whenever we accept at all: the footer answer IS the final
    * answer (no partial-aggregation semantics needed).
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    evalAggregation(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggScan = evalAggregation(agg)
    aggScan.isDefined
  }

  // ---- limit pushdown: read only a row-covering file prefix ----

  /** PARTIAL limit pushdown (Spark re-applies the limit above the
    * scan): accept only the filterless shape, and serve the scan from a
    * file PREFIX whose footer row counts cover the limit
    * ([[Store.filesForLimit]]) — `LIMIT 10` against a 100 TB item reads
    * one chunk file. Filters make the residual-filtered row yield
    * unpredictable, so any pushed filter refuses (Spark's own planner
    * already never pushes a limit below a post-scan filter — this is
    * defense in depth).
    */
  override def pushLimit(n: Int): Boolean = {
    if (pushed.nonEmpty || n <= 0) false
    else { limit = Some(n); true }
  }

  // ---- TopN pushdown: ORDER BY <index> [DESC] LIMIT k reads only a
  // bucket prefix/suffix ----

  /** PARTIAL TopN pushdown (Spark re-sorts and re-limits above the
    * scan): accept `ORDER BY <index> [ASC|DESC] LIMIT k` with no
    * filters, and only when the item's bucket layout is order-prunable
    * ([[Store.orderPrunable]] — the probe that also vetoes NULL-index
    * buckets, whose sort position the bucket order cannot know). The
    * flagship time-series shape — "the newest k rows of a 100 TB item"
    * — becomes a read of the newest bucket(s): bucket dirs partition
    * time, so once the selected buckets' footer row counts cover k,
    * every excluded row's index lies strictly beyond the selection and
    * the true top-k are inside it. Filters refuse for the same reason
    * as pushLimit: the residual-filtered yield of a file prefix is
    * unpredictable (Spark keeps the Filter node above the scan for our
    * all-residual pushFilters, so this path is defense in depth).
    */
  override def pushTopN(orders: Array[V2SortOrder], n: Int): Boolean = {
    if (pushed.nonEmpty || limit.isDefined || n <= 0 || orders.length != 1) false
    else {
      val o = orders(0)
      val onIndex = o.expression() match {
        case nr: NamedReference if nr.fieldNames().length == 1 &&
          nr.fieldNames()(0).equalsIgnoreCase(store.indexName) => true
        case _ => false
      }
      if (!onIndex || !store.orderPrunable(key)) false
      else {
        topN = Some((n, o.direction() == SortDirection.DESCENDING))
        true
      }
    }
  }

  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = aggScan.getOrElse {
    val (start, end) = GraftBounds.tsBounds(pushed.toIndexedSeq, store.indexName)
    // batch: the pruning decision — LIST only the bucket dirs the
    // bounds allow (or, under a pushed LIMIT, only a row-covering file
    // prefix), deferred to first batch use so a streaming read never
    // pays for it. The scan assembly itself (pruned file index +
    // Spark's vectorized ParquetScan) is Spark-internal API,
    // quarantined in [[SparkInternals]] — the one file a Spark bump
    // may break. Streaming: [[GraftScan.toMicroBatchStream]].
    val mft = Option(options.get("maxFilesPerTrigger")).map(_.trim.toInt)
    // streaming seen-log snapshot cadence (tests shrink it; 0 disables)
    val snapEvery = Option(options.get("snapshotEvery")).map(_.trim.toInt)
      .getOrElse(GraftMicroBatchStream.DefaultSnapshotEvery)
    (topN, limit) match {
      case (Some((k, desc)), _) =>
        // selection re-runs lazily at first batch use (vanish-tolerant:
        // an uncoverable k degrades to the full listing, never an
        // error); like LIMIT, the fixed file set ignores runtime filters
        new GraftScan(store, key, required, pushed,
          () => store.filesForTopN(key, k.toLong, desc)
            .map(new org.apache.hadoop.fs.Path(_)),
          maxFilesPerTrigger = mft,
          snapshotEvery = snapEvery,
          tag = s"pushedTopN=[${store.indexName} ${if (desc) "DESC" else "ASC"} LIMIT $k]")
      case (None, Some(n)) =>
        // a LIMIT-prefixed scan keeps its fixed file list — runtime
        // filters would only shrink what the re-applied limit already
        // bounds, not worth re-listing
        new GraftScan(store, key, required, pushed,
          () => store.filesForLimit(key, n.toLong)
            .map(new org.apache.hadoop.fs.Path(_)),
          maxFilesPerTrigger = mft,
          snapshotEvery = snapEvery,
          tag = s"pushedLimit=$n")
      case (None, None) =>
        new GraftScan(store, key, required, pushed,
          () => store.prunedRoots(key, start, end),
          maxFilesPerTrigger = mft,
          staticBounds = (start, end),
          runtimePrune = Some((s2, e2) => store.prunedRoots(key, s2, e2)),
          snapshotEvery = snapEvery)
    }
  }
}

/** Index-bound extraction shared by the build-time pushdown and the
  * runtime (DPP) filter path.
  */
private[v2] object GraftBounds {

  def later(a: Option[Timestamp], b: Option[Timestamp]): Option[Timestamp] =
    (a ++ b).reduceOption((x, y) => if (x.after(y)) x else y)
  def earlier(a: Option[Timestamp], b: Option[Timestamp]): Option[Timestamp] =
    (a ++ b).reduceOption((x, y) => if (x.before(y)) x else y)

  /** Inclusive [start, end] bounds on the index column implied by the
    * filters. Conjunctions tighten; anything else (Or, Not, non-index
    * columns) contributes nothing — pruning stays a superset of the
    * true result, the residual filters make it exact. Filter values
    * arrive as [[java.sql.Timestamp]] (default) or
    * [[java.time.Instant]] (datetimeJava8API); both are handled. An
    * `In` on the index (the shape a dynamic-pruning subquery
    * translates to) contributes its value envelope [min, max] — only
    * when EVERY value converts, since a partial envelope could cut
    * files a non-converted value still needs.
    */
  def tsBounds(filters: Seq[Filter], idx: String)
      : (Option[Timestamp], Option[Timestamp]) = {
    def ts(v: Any): Option[Timestamp] = v match {
      case t: java.sql.Timestamp => Some(t)
      case i: java.time.Instant => Some(Timestamp.from(i))
      case _ => None
    }
    def one(f: Filter): (Option[Timestamp], Option[Timestamp]) = f match {
      case GreaterThan(c, v) if c.equalsIgnoreCase(idx) => (ts(v), None)
      case GreaterThanOrEqual(c, v) if c.equalsIgnoreCase(idx) => (ts(v), None)
      case LessThan(c, v) if c.equalsIgnoreCase(idx) => (None, ts(v))
      case LessThanOrEqual(c, v) if c.equalsIgnoreCase(idx) => (None, ts(v))
      case EqualTo(c, v) if c.equalsIgnoreCase(idx) => (ts(v), ts(v))
      case In(c, vs) if c.equalsIgnoreCase(idx) && vs.nonEmpty =>
        val converted = vs.toSeq.map(ts)
        if (converted.exists(_.isEmpty)) (None, None)
        else {
          val all = converted.flatten
          (Some(all.reduce((a, b) => if (a.before(b)) a else b)),
            Some(all.reduce((a, b) => if (a.after(b)) a else b)))
        }
      case And(l, r) =>
        val (ll, lh) = one(l); val (rl, rh) = one(r)
        (later(ll, rl), earlier(lh, rh))
      case _ => (None, None)
    }
    filters.map(one).foldLeft((Option.empty[Timestamp], Option.empty[Timestamp])) {
      case ((lo, hi), (l, h)) => (later(lo, l), earlier(hi, h))
    }
  }
}

/** The aggregate-pushdown result: a [[LocalScan]] carrying the ONE row
  * the footer sweep proved exact. Spark plans it as a
  * LocalTableScanExec — the query's "scan" is a driver-local row, no
  * file I/O, no executors; `SELECT count(*) FROM graft.EVENTS` on a
  * 100 TB item costs O(files) footer metadata instead of a
  * cluster-wide scan. Built ONLY by [[GraftScanBuilder.pushAggregation]]
  * after exactness is proved; never load-bearing for correctness — an
  * unprovable statistic refuses the pushdown instead of degrading it.
  */
final class GraftAggScan(
    out: StructType, row: InternalRow, desc: String) extends LocalScan {
  override def readSchema(): StructType = out
  override def rows(): Array[InternalRow] = Array(row)
  override def description(): String = s"GraftAggScan(footer-stats) $desc"
}
