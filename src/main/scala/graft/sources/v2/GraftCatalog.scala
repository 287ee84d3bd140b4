package graft.sources.v2

import graft.sources.{SchemaError, Store}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A [[TableCatalog]] over one Store: every item is a table, with ZERO
  * per-item DDL. Configure once per session —
  *
  * {{{
  *   spark.sql.catalog.graft       = graft.sources.v2.GraftCatalog
  *   spark.sql.catalog.graft.path  = /path/to/store
  *   // optional, for multi-driver leased deployments:
  *   spark.sql.catalog.graft.writerLease = true
  * }}}
  *
  * — and the store's items are discoverable and queryable by name:
  *
  * {{{
  *   SHOW TABLES IN graft;
  *   SELECT * FROM graft.EVENTS WHERE TS BETWEEN '...' AND '...';
  *   INSERT INTO graft.EVENTS VALUES (...);    -- the += contract
  *   CREATE TABLE graft.FRESH;                 -- new empty item
  *   DROP TABLE graft.OLD;                     -- Store.drop
  * }}}
  *
  * This is the reference's `store['KEY']` discovery contract
  * (oakstore/store.py:133-134: any valid key resolves to its item)
  * lifted to the SQL catalog surface. Tables load as [[GraftTable]] —
  * the SAME class the `USING graft` provider serves — so bucket-dir
  * pruning, parquet row-group pushdown, listing freshness, and the
  * idempotent appendNewOnly INSERT path carry over unchanged.
  *
  * Shape notes:
  *  - The catalog is FLAT: a store is a directory of items, so the
  *    only namespace is the empty one (`graft.EVENTS`, not
  *    `graft.ns.EVENTS`). [[SupportsNamespaces]] is implemented for
  *    exactly that: SHOW NAMESPACES works and returns nothing nested.
  *  - `CREATE TABLE graft.X` creates an EMPTY item (the store's
  *    schema is store-wide, so a column list must either be omitted
  *    or match it exactly); partitioning clauses are refused — the
  *    store owns its time-bucketed layout.
  *  - `ALTER TABLE` and `RENAME` are refused loudly: the schema is
  *    store-wide by the reference contract (store.py:113-117), and
  *    rename is not part of the item lifecycle.
  *  - The Store handle attaches lazily on first use and is cached for
  *    the catalog's lifetime (Spark keeps one catalog instance per
  *    session); item listings and existence checks always go to the
  *    filesystem, so items created by OTHER writers appear without
  *    any refresh incantation.
  *  - STREAMING: catalog-qualified reads work
  *    (`spark.readStream.table("cat.ITEM")` — the table carries
  *    MICRO_BATCH_READ); streaming WRITES go through
  *    `df.writeStream.format("graft").option("path",…).option("item",…)`
  *    (or [[Store.ingestStream]]) rather than `toTable` — the
  *    epoch-ingest sink is the V1 driver-side shape the idempotent
  *    appendNewOnly contract wants, and `toTable` demands the DSv2
  *    executor-writer API that would re-implement parquet task writing
  *    appendNewOnly already does right.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var path: String = _
  private var lease: Boolean = false
  @volatile private var cached: Store = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    path = options.get("path")
    if (path == null || path.isEmpty)
      throw new SchemaError(
        s"catalog '$name' needs a store path: set spark.sql.catalog.$name.path")
    lease = options.getBoolean("writerLease", false)
  }

  override def name(): String = catalogName

  /** Lazy + cached: initialize() must not touch the filesystem (Spark
    * initializes catalogs eagerly at first reference, even for queries
    * that never read this one), and attach() is several metadata
    * round-trips worth not repeating per statement.
    */
  private def store: Store = {
    val s = cached
    if (s != null) s
    else this.synchronized {
      if (cached == null)
        cached = Store.attach(SparkSession.active, path, writerLease = lease)
      cached
    }
  }

  private def requireFlat(namespace: Array[String]): Unit =
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)

  private def keyOf(ident: Identifier): String = {
    requireFlat(ident.namespace())
    store.validateKey(ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    store.listItems().map(k => Identifier.of(Array.empty[String], k)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val k = keyOf(ident)
    // existence is checked here, not lazily at scan build like the
    // per-table provider: a catalog lookup of a missing table must be
    // the standard TABLE_OR_VIEW_NOT_FOUND, so SQL tooling (IF EXISTS,
    // suggestions, notebook autocompletion) behaves
    if (!store.exists(k)) throw new NoSuchTableException(ident)
    new GraftTable(store, k)
  }

  override def tableExists(ident: Identifier): Boolean =
    try store.exists(keyOf(ident))
    catch { case _: NoSuchNamespaceException | _: SchemaError => false }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val k = keyOf(ident)
    if (store.exists(k)) throw new TableAlreadyExistsException(ident)
    if (partitions.nonEmpty)
      throw new SchemaError(
        s"graft item $k cannot declare PARTITIONED BY — the store owns its " +
          "time-bucketed layout (Store.open(bucket = ...))")
    // the store's schema is store-wide (reference store.py:113-117):
    // a CREATE TABLE column list is either absent or must agree
    if (schema != null && schema.length > 0 && schema.json != store.schema.json)
      throw new SchemaError(
        s"CREATE TABLE schema ${schema.catalogString} does not match the " +
          s"store-wide schema ${store.schema.catalogString} at $path — omit " +
          "the column list")
    val spark = SparkSession.active
    store.write(k, spark.createDataFrame(
      java.util.Collections.emptyList[Row](), store.schema))
    new GraftTable(store, k)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new SchemaError(
      s"ALTER TABLE is not supported on graft items — the schema is " +
        s"store-wide and persisted at $path (reference contract: one schema " +
        "per store)")

  override def dropTable(ident: Identifier): Boolean = {
    val k = keyOf(ident)
    if (!store.exists(k)) false
    else { store.drop(k); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new SchemaError(
      "RENAME TABLE is not supported on graft items — copy via " +
        "INSERT INTO new SELECT * FROM old, then DROP the old item")

  // ---- SupportsNamespaces: the catalog is flat by construction ----

  override def listNamespaces(): Array[Array[String]] = Array.empty

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireFlat(namespace)
    Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    requireFlat(namespace)
    java.util.Collections.emptyMap[String, String]()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    throw new SchemaError(
      "graft catalogs are flat — a store has items, not namespaces")

  override def alterNamespace(
      namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new SchemaError(
      "graft catalogs are flat — a store has items, not namespaces")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean =
    throw new SchemaError(
      "graft catalogs are flat — a store has items, not namespaces")
}
