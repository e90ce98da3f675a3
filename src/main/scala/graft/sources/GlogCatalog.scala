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
  * directory does, a table iff its directory carries the
  * `_glog.table` MARKER file. The marker does three jobs: (1) it
  * keeps namespace directories from ever resolving as tables (so
  * `DROP TABLE cat.ns` can never recursively delete a namespace);
  * (2) its EXCLUSIVE creation is the concurrent-CREATE arbiter — two
  * racing creators get one winner, the loser a loud
  * TableAlreadyExistsException, never a shared directory (`mkdirs`
  * succeeds for both, so it cannot arbitrate); (3) it DURABLY stores
  * the CREATE-time table properties (java.util.Properties text);
  * later SET/UNSET TBLPROPERTIES publish VERSIONED property files
  * under `_glog_metadata/` via the manifest commit's
  * publish-if-absent CAS (newest wins, concurrent alters both
  * survive, no in-place truncation), so `TBLPROPERTIES` survive
  * restarts and are visible to any engine that lists the warehouse.
  * Column ALTERs are rejected — the glog schema is fixed by the
  * format.
  *
  * Reference analog: the flash partition TABLE of the SDK — a fixed
  * on-device directory of named record regions resolved by name at
  * open time, not by raw byte offsets
  * (imc22_sdk/flash_loader.c:61-62's loader resolves regions the
  * same one-seam way). */
class GlogCatalog extends TableCatalog with SupportsNamespaces {
  import GlogCatalog.MarkerName

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

  private def markerPath(ident: Identifier): Path =
    new Path(tablePath(ident), MarkerName)

  // TBLPROPERTIES are VERSIONED: the marker carries the CREATE-time
  // set; every ALTER publishes `_glog_metadata/_props-<N>.properties`
  // via the same publish-if-absent CAS the manifest commit uses, and
  // reads resolve the newest. Two jobs: (a) no in-place truncate —
  // a crash or concurrent reader can never see a half-written set
  // (each version appears atomically or not at all); (b) no lost
  // updates — two concurrent SET TBLPROPERTIES race on the next
  // version name, the loser re-reads and re-applies, both properties
  // survive (spec: PropertiesSpec).
  private val PropsPrefix = "_props-"
  private val PropsSuffix = ".properties"
  private def propsPath(ident: Identifier, v: Long): Path =
    new Path(new Path(tablePath(ident), GraftLogSource.MetaDirName),
      f"$PropsPrefix$v%012d$PropsSuffix")

  private def propsVersion(ident: Identifier): Long = {
    val meta = new Path(tablePath(ident), GraftLogSource.MetaDirName)
    (try fs.listStatus(meta)
     catch { case _: java.io.FileNotFoundException =>
       Array.empty[org.apache.hadoop.fs.FileStatus] })
      .map(_.getPath.getName)
      .filter(n => n.startsWith(PropsPrefix) && n.endsWith(PropsSuffix))
      .flatMap(_.stripPrefix(PropsPrefix).stripSuffix(PropsSuffix).toLongOption)
      .maxOption.getOrElse(0L)
  }

  private def loadProps(p: Path): Map[String, String] = {
    val props = new java.util.Properties()
    val in = fs.open(p)
    try props.load(new java.io.InputStreamReader(in,
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
    import scala.jdk.CollectionConverters._
    props.asScala.toMap
  }

  private def readProps(ident: Identifier): Map[String, String] = {
    val v = propsVersion(ident)
    if (v == 0L) loadProps(markerPath(ident))
    else loadProps(propsPath(ident, v))
  }

  private def propsBytes(props: Map[String, String]): Array[Byte] = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v): Unit }
    val bos = new java.io.ByteArrayOutputStream()
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(bos,
      java.nio.charset.StandardCharsets.UTF_8))
    p.store(w, null)
    w.close()
    // strip Properties.store's wall-clock comment line: the marker
    // must be deterministic for a given property set
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.filterNot(_.startsWith("#"))
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }


  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .filter(tableExists)
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GlogTable(tablePath(ident).toString, pushdown = true,
      tableProps = readProps(ident))
  }

  /** SQL time travel: `SELECT ... FROM cat.ns.t VERSION AS OF n`
    * resolves the table pinned to manifest version n (read-only —
    * writes/DML against a snapshot are rejected). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"glog: VERSION AS OF takes a numeric manifest version, got '$version'"))
    new GlogTable(tablePath(ident).toString, pushdown = true,
      tableProps = readProps(ident), pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF t`: the newest manifest version whose commit
    * mtime is <= t (Spark hands micros since epoch) — the SHARED
    * [[GraftLogSource.versionAtTimestamp]] resolution, so the SQL
    * spelling, the `timestampAsOf` reader option, the CDC stream's
    * `startingTimestamp`, and the feed's timestamp endpoints all pin
    * the same version for the same instant. Approximate the way all
    * mtime-based time travel is — the filesystem clock is the
    * ledger. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = GraftLogSource.resolveDir(tablePath(ident).toString)
    val v = GraftLogSource.versionAtTimestamp(dir, conf,
      timestampMicros / 1000L, "TIMESTAMP AS OF")
    new GlogTable(tablePath(ident).toString, pushdown = true,
      tableProps = readProps(ident), pinnedVersion = Some(v))
  }

  /** A table is a directory CARRYING the marker — a bare namespace
    * (or foreign) directory never resolves as a table, so DML/DROP
    * against `cat.ns` fails loudly instead of treating the namespace
    * as an empty table. */
  override def tableExists(ident: Identifier): Boolean =
    fs.exists(markerPath(ident))

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    // the glog schema is fixed by the format: accept an empty schema
    // (CREATE TABLE t USING glog) or exactly the canonical one —
    // names AND types (nullability-insensitive); anything else is a
    // loud analysis-time error, not a silent remap served with the
    // fixed types
    val s = info.schema()
    val canonical = GraftLogSource.SchemaFixed
    val matches = s.length == canonical.length &&
      s.fields.zip(canonical.fields).forall { case (a, b) =>
        a.name == b.name && a.dataType == b.dataType
      }
    require(s.isEmpty || matches,
      s"glog tables have the fixed schema " +
        canonical.fields.map(f => s"${f.name} ${f.dataType.sql}")
          .mkString("(", ", ", ")") +
        s"; got " + s.fields.map(f => s"${f.name} ${f.dataType.sql}")
          .mkString("(", ", ", ")"))
    require(info.partitions().isEmpty,
      "glog tables do not support partition transforms (the zone map " +
        "IS the layout; use option clustered=true on writes)")
    val ns = nsPath(ident.namespace())
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(ident.namespace())
    require(fs.mkdirs(tablePath(ident)),
      s"glog catalog: cannot create ${tablePath(ident)}")
    // the marker's EXCLUSIVE creation is the arbiter: mkdirs succeeds
    // for every racing creator, the marker link for exactly one
    import scala.jdk.CollectionConverters._
    val userProps = Option(info.properties()).map(_.asScala.toMap)
      .getOrElse(Map.empty)
      .filterNot { case (k, _) => GlogCatalog.ReservedProps(k) }
    val tmp = new Path(tablePath(ident),
      s".marker-${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(propsBytes(userProps)) finally out.close()
    if (!GraftLogSource.publishIfAbsent(fs, tmp, markerPath(ident))) {
      fs.delete(tmp, false): Unit
      throw new TableAlreadyExistsException(ident)
    }
    new GlogTable(tablePath(ident).toString, pushdown = true,
      tableProps = userProps)
  }

  /** The glog schema is fixed by the format — reject column changes
    * at analysis time. SET/UNSET TBLPROPERTIES are DURABLE and
    * CAS-committed: read the newest props version, apply the changes,
    * publish as version+1 iff that version does not exist yet, retry
    * on a lost race — two concurrent property changes both survive
    * (no read-modify-write lost update), and no file is ever
    * truncated in place (still filesystem-is-the-metastore). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val structural = changes.exists {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => false
      case _ => true
    }
    require(!structural,
      "glog tables have a fixed schema; ALTER TABLE column changes are " +
        "not supported")
    val meta = new Path(tablePath(ident), GraftLogSource.MetaDirName)
    fs.mkdirs(meta): Unit
    var attempt = 0
    while (attempt < 10000) {
      attempt += 1
      val base = propsVersion(ident)
      val cur =
        if (base == 0L) loadProps(markerPath(ident))
        else loadProps(propsPath(ident, base))
      val updated = changes.foldLeft(cur) {
        case (props, c: TableChange.SetProperty) =>
          props + (c.property() -> c.value())
        case (props, c: TableChange.RemoveProperty) => props - c.property()
        case (props, _) => props
      }
      val tmp = new Path(meta, s".props-${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(propsBytes(updated)) finally out.close()
      if (GraftLogSource.publishIfAbsent(fs, tmp, propsPath(ident, base + 1)))
        return loadTable(ident)
      fs.delete(tmp, false): Unit // lost the race: re-read, re-apply
    }
    throw new IllegalStateException(
      s"glog catalog: TBLPROPERTIES CAS for $ident did not converge " +
        s"after $attempt attempts")
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(tablePath(ident), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val target = tablePath(newIdent)
    if (!fs.exists(target.getParent))
      throw new NoSuchNamespaceException(newIdent.namespace())
    // the directory rename is the arbiter on a real FS: onto an
    // existing directory it fails, and the loud require surfaces it
    require(fs.rename(tablePath(oldIdent), target),
      s"glog catalog: rename ${tablePath(oldIdent)} -> $target failed " +
        "(does the target already exist?)")
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

object GlogCatalog {
  /** Marker file every glog catalog table carries: its presence is
    * table-ness (a namespace dir can never resolve as a table), its
    * exclusive creation the concurrent-CREATE arbiter, its content
    * the durable TBLPROPERTIES. */
  val MarkerName = "_glog.table"

  /** Engine-managed property keys never persisted to the marker. */
  private val ReservedProps: Set[String] =
    Set("provider", "location", "owner", "external", "comment")
}
