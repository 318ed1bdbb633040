package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}

/** Persisted MATERIALIZED-VIEW definitions (round 18 — the SQL-DDL gap
  * the round-17 verdict ranked #4): one small JSON document per
  * matview under `<warehouse>/<namespace>/_graft_matviews/<name>.json`,
  * the exact storage discipline of [[GraftViews]] (atomic tmp+rename
  * swap, single-GET reads). The document is everything a FRESH session
  * needs to re-arm the automatic rewrite
  * ([[graft.engine.MaterializedViews]]) and the incremental refresh
  * ([[graft.engine.Incremental]]): the defining SELECT text, its
  * captured name-resolution context, the RESOLVED source table, and
  * the partition column the refresh scopes by. The mart's DATA is an
  * ordinary manifest-managed table at the matview's own identifier —
  * directly queryable, exactly like a Postgres matview relation.
  */
private[graft] object GraftMatviews {

  final case class MatviewDoc(sql: String, currentCatalog: String,
      currentNamespace: Seq[String], sourceCatalog: String,
      sourceNamespace: Seq[String], sourceTable: String,
      dateCol: String)

  def dir(root: String, ns: Seq[String]): Path =
    new Path(s"$root/${ns.mkString("/")}/_graft_matviews")

  def file(root: String, ns: Seq[String], name: String): Path =
    new Path(dir(root, ns), s"$name.json")

  private val om = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def write(fs: FileSystem, root: String, ns: Seq[String], name: String,
      doc: MatviewDoc): Unit = {
    val d = dir(root, ns)
    fs.mkdirs(d)
    val tmp = new Path(d, s".$name.json.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(om.writeValueAsBytes(doc)) finally out.close()
    val dst = file(root, ns, name)
    if (fs.exists(dst) && !fs.rename(tmp, dst)) {
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"matview write failed: $dst")
    } else if (!fs.exists(dst)) {
      require(fs.rename(tmp, dst), s"matview write failed: $dst")
    }
  }

  def read(fs: FileSystem, root: String, ns: Seq[String],
      name: String): Option[MatviewDoc] = {
    val f = file(root, ns, name)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val bytes = try in.readAllBytes() finally in.close()
      Some(om.readValue(bytes, classOf[MatviewDoc]))
    }
  }

  def list(fs: FileSystem, root: String, ns: Seq[String]): Seq[String] = {
    val d = dir(root, ns)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(".json")).filterNot(_.startsWith("."))
      .map(_.stripSuffix(".json")).sorted.toSeq
  }

  def delete(fs: FileSystem, root: String, ns: Seq[String],
      name: String): Boolean = {
    val f = file(root, ns, name)
    val existed = fs.exists(f) && fs.delete(f, false)
    val d = dir(root, ns)
    if (existed && fs.exists(d) && fs.listStatus(d).isEmpty)
      fs.delete(d, false)
    existed
  }
}
