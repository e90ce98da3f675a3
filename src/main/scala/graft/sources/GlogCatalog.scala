package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 CATALOG for glog tables — manage tables by NAME
  * (`glogcat.ns.t`) instead of by raw path options, the last piece
  * of the connector's deployment story: a warehouse root on any
  * Hadoop filesystem, one directory per namespace, one table
  * directory per table. Register with
  * `spark.sql.catalog.<name> = graft.sources.GlogCatalog` and
  * `spark.sql.catalog.<name>.warehouse = <dir>`; then
  * `CREATE TABLE <name>.ns.t USING glog` / INSERT / SELECT / DML /
  * DROP all resolve through this plugin with no path in sight —
  * every table inherits the full GlogTable surface (pushdown, zone
  * maps, runtime filters, DML, streaming both ways).
  *
  * The metastore IS the filesystem: a namespace exists iff its
  * directory does, a table iff its directory under the namespace
  * does. That makes the catalog trivially multi-engine (anything
  * that can list the warehouse sees the same tables) and crash-safe
  * (no second source of truth to drift). The trade is documented
  * honestly: no table-level ACLs or comments survive beyond the
  * directory, and `alterTable` is rejected — the glog schema is
  * fixed by the format.
  *
  * Reference analog: the flash partition TABLE of the SDK — a fixed
  * on-device directory of named record regions resolved by name at
  * open time, not by raw byte offsets
  * (imc22_sdk/flash_loader.c:61-62's loader resolves regions the
  * same one-seam way). */
class GlogCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"glog catalog '$name' requires spark.sql.catalog.$name.warehouse")
    warehouse = GraftLogSource.resolveDir(w)
  }

  override def name(): String = catalogName

  private def conf = GraftLogSource.driverHadoopConf()
  private def fs = GraftLogSource.fsFor(warehouse, conf)

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)((p, n) => new Path(p, n))
  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), ident.name())

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!fs.exists(p)) throw new NoSuchTableException(ident)
    new GlogTable(p.toString, pushdown = true)
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(tablePath(ident))

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    // the glog schema is fixed by the format: accept an empty schema
    // (CREATE TABLE t USING glog) or exactly the canonical one;
    // anything else is a loud analysis-time error, not a silent remap
    val s = info.schema()
    require(s.isEmpty ||
        s.fieldNames.sameElements(GraftLogSource.SchemaFixed.fieldNames),
      s"glog tables have the fixed schema " +
        s"${GraftLogSource.SchemaFixed.fieldNames.mkString("(", ", ", ")")}; " +
        s"got ${s.fieldNames.mkString("(", ", ", ")")}")
    require(info.partitions().isEmpty,
      "glog tables do not support partition transforms (the zone map " +
        "IS the layout; use option clustered=true on writes)")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val ns = nsPath(ident.namespace())
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(ident.namespace())
    require(fs.mkdirs(tablePath(ident)),
      s"glog catalog: cannot create ${tablePath(ident)}")
    new GlogTable(tablePath(ident).toString, pushdown = true)
  }

  /** The glog schema is fixed by the format — reject column changes
    * at analysis time. Property-only changes are accepted as no-ops
    * (there is nowhere durable to put them; the filesystem is the
    * whole metastore). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val structural = changes.exists {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => false
      case _ => true
    }
    require(!structural,
      "glog tables have a fixed schema; ALTER TABLE column changes are " +
        "not supported")
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    fs.exists(tablePath(ident)) && fs.delete(tablePath(ident), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val target = tablePath(newIdent)
    if (!fs.exists(target.getParent))
      throw new NoSuchNamespaceException(newIdent.namespace())
    require(fs.rename(tablePath(oldIdent), target),
      s"glog catalog: rename ${tablePath(oldIdent)} -> $target failed")
  }

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    if (!fs.exists(warehouse)) return Array.empty
    fs.listStatus(warehouse).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Map.of("location", nsPath(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    require(fs.mkdirs(nsPath(namespace)),
      s"glog catalog: cannot create namespace ${nsPath(namespace)}")
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "glog catalog namespaces carry no alterable metadata (the " +
        "filesystem is the metastore)")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    fs.delete(nsPath(namespace), true)
  }
}
