package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persisted SQL views (round 17 — the BI-layer gap): view METADATA
  * (the SQL text, its captured name-resolution context, the schema at
  * definition) stored as one small JSON document per view under
  * `<warehouse>/<namespace>/_graft_views/<name>.json`. Views are pure
  * metadata — no data files, no manifest — so create/replace/drop are
  * single-file operations made atomic by write-to-temp + rename (the
  * same primitive as manifest list commits); a reader never sees a
  * half-written definition, and CREATE OR REPLACE swaps in one rename.
  *
  * The reference's DM layer exists to feed a BI tool (`README.md:39-85`,
  * Metabase in `docker-compose.yaml:67`), and saved views are the first
  * artifact such a consumer creates over the marts; Spark's session
  * temp views do not survive the session, so this is the persistent
  * twin, resolved through the DSv2 [[org.apache.spark.sql.connector
  * .catalog.ViewCatalog]] at read time — the engine re-analyzes the
  * stored SQL against the CURRENT table snapshots, exactly like
  * Postgres view expansion.
  *
  * Scale note: a view read costs one small GET before planning; the
  * expanded query then plans with full pushdown/pruning against the
  * underlying manifest tables — a view adds zero scan cost at 100 TB.
  */
private[catalog] object GraftViews {

  final case class ViewDoc(sql: String, currentCatalog: String,
      currentNamespace: Seq[String], schemaJson: String,
      queryColumnNames: Seq[String], columnAliases: Seq[String],
      columnComments: Seq[String], properties: Map[String, String]) {
    def schema: StructType =
      DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  def viewsDir(root: String, ns: Seq[String]): Path =
    new Path(s"$root/${ns.mkString("/")}/_graft_views")

  def viewFile(root: String, ns: Seq[String], name: String): Path =
    new Path(viewsDir(root, ns), s"$name.json")

  private val om = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def write(fs: FileSystem, root: String, ns: Seq[String], name: String,
      doc: ViewDoc): Unit = {
    val dir = viewsDir(root, ns)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$name.json.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(om.writeValueAsBytes(doc)) finally out.close()
    val dst = viewFile(root, ns, name)
    // rename-over is the atomic replace on HDFS-like stores; local FS
    // rename refuses an existing destination, so clear it first (the
    // caller holds no lease — views are last-writer-wins metadata,
    // like Postgres CREATE OR REPLACE VIEW under its catalog lock)
    if (fs.exists(dst) && !fs.rename(tmp, dst)) {
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"view write failed: $dst")
    } else if (!fs.exists(dst)) {
      require(fs.rename(tmp, dst), s"view write failed: $dst")
    }
  }

  def read(fs: FileSystem, root: String, ns: Seq[String],
      name: String): Option[ViewDoc] = {
    val f = viewFile(root, ns, name)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val bytes = try in.readAllBytes() finally in.close()
      Some(om.readValue(bytes, classOf[ViewDoc]))
    }
  }

  def list(fs: FileSystem, root: String, ns: Seq[String]): Seq[String] = {
    val dir = viewsDir(root, ns)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".json")).filterNot(_.startsWith("."))
      .map(_.stripSuffix(".json")).sorted.toSeq
  }

  def delete(fs: FileSystem, root: String, ns: Seq[String],
      name: String): Boolean = {
    val f = viewFile(root, ns, name)
    val existed = fs.exists(f) && fs.delete(f, false)
    // retire an emptied _graft_views dir so a view-free namespace drops
    // without CASCADE again
    val dir = viewsDir(root, ns)
    if (existed && fs.exists(dir) && fs.listStatus(dir).isEmpty)
      fs.delete(dir, false)
    existed
  }
}
