package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-TABLE snapshot isolation: one atomically-swapped publication
  * pointer pinning a consistent set of (table → manifest version)
  * pairs — the multi-statement-transaction guarantee the reference
  * gets from Postgres (its star build runs inside one DAG whose
  * readers see each table transactionally, and a dashboard joining
  * fact to dims mid-load still sees a coherent pair because every
  * INSERT batch commits atomically).
  *
  * Per-table manifests (round 11, [[Manifest]]) give readers
  * single-table snapshot isolation, but a star-schema reader joins
  * SEVERAL tables: a daily load that has committed the new fact but
  * not yet the new royalties mart exposes a fact⋈mart mismatch to any
  * reader resolving each table's latest version independently. A
  * publication closes that: the writer commits each table as before,
  * then publishes ONE file naming every table's pinned version
  * (create + atomic rename, exactly the manifest discipline);
  * a reader resolves the publication once and reads every table AS OF
  * its pinned version — all-old or all-new across the whole star,
  * never mixed. Old publications remain resolvable (cross-table time
  * travel) until their pinned manifest versions are vacuumed.
  *
  * Scale: a publication is one tiny metadata file naming ~10 tables —
  * commit cost is O(1) regardless of data size, and reads pay one
  * extra file read per query, amortized across every table it joins.
  */
object Publication {

  private val DirName = "_graft_publication"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pdir(root: String) = new Path(root, DirName)

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".pub"))
      n.stripPrefix("v").stripSuffix(".pub").toLongOption
    else None
  }

  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val d = pdir(root)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.flatMap(s => versionOf(s.getPath)).sorted
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Pin the CURRENT manifest version of every named table (relative to
    * `root`) into a new publication version — one atomic pointer swap.
    * Tables must be manifest-managed (a table without a committed
    * manifest has no pinnable snapshot — loud error, not a guess).
    * Lease-guarded so concurrent publishers serialize.
    */
  def publish(spark: SparkSession, root: String,
      tables: Seq[String]): Long = {
    require(tables.nonEmpty, "publish: empty table list")
    WriterLease.withLease(spark, pdir(root).toString) {
      val pinned = tables.sorted.map { t =>
        val v = Manifest.currentVersion(spark, s"$root/$t").getOrElse(
          throw new IllegalStateException(
            s"publish: $root/$t has no committed manifest — " +
              "write it through the engine's writers first"))
        s"$t=$v"
      }
      val fs = fsOf(spark, root)
      val d = pdir(root)
      fs.mkdirs(d)
      val next = currentVersion(spark, root).getOrElse(0L) + 1
      val tmp = new Path(d, f"v$next%020d.pub.tmp")
      val out = fs.create(tmp, true)
      try out.write(pinned.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      val fin = new Path(d, f"v$next%020d.pub")
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(s"publication commit failed: $tmp -> $fin")
      next
    }
  }

  /** The (table → pinned manifest version) map of a publication. */
  def resolveAsOf(spark: SparkSession, root: String,
      v: Long): Map[String, Long] = {
    val fs = fsOf(spark, root)
    val f = new Path(pdir(root), f"v$v%020d.pub")
    require(fs.exists(f), s"no publication v$v under $root")
    val in = fs.open(f)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split("\n").filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf('=')
      line.substring(0, i) -> line.substring(i + 1).toLong
    }.toMap
  }

  def resolve(spark: SparkSession, root: String): Option[Map[String, Long]] =
    currentVersion(spark, root).map(resolveAsOf(spark, root, _))

  /** Warehouse-wide history retirement that CANNOT dangle a retained
    * publication: keep the newest `keepPubs` publications (deleting
    * older publication files), then vacuum every table ANY retained
    * publication names, protecting exactly the manifest versions those
    * publications pin — [[Manifest.vacuum]]'s `protect` hook. A table's
    * own keep-count still applies on top, so unpinned intermediate
    * versions retire normally. Per-table vacuum without this guard
    * could delete a version an old publication still points at,
    * breaking cross-table time travel; this is the one safe entry
    * point once a warehouse publishes. Returns (publications deleted,
    * data files deleted across tables).
    */
  def vacuumWarehouse(spark: SparkSession, root: String,
      keepPubs: Int = 2, keepTables: Int = 2): (Int, Int) = {
    require(keepPubs >= 1, "vacuumWarehouse must keep the current publication")
    WriterLease.withLease(spark, pdir(root).toString) {
      val fs = fsOf(spark, root)
      val vs = versions(spark, root)
      val (dropPubs, keptPubs) =
        vs.splitAt(math.max(0, vs.size - keepPubs))
      val pins: Map[String, Set[Long]] = keptPubs
        .flatMap(v => resolveAsOf(spark, root, v).toSeq)
        .groupBy(_._1).map { case (t, tv) => t -> tv.map(_._2).toSet }
      // Delete the dropped .pub files FIRST: a concurrent reader can
      // only resolve publications still listed, so retiring the
      // listing before vacuuming the versions it pinned closes the
      // window where a just-resolved old publication points at files
      // the vacuum below is about to delete. (Tables named ONLY by
      // dropped publications are not vacuumed here — they keep their
      // own history until a retained publication or a direct
      // Manifest.vacuum names them; documented, not silent.)
      dropPubs.foreach(v =>
        fs.delete(new Path(pdir(root), f"v$v%020d.pub"), false))
      val filesDeleted = pins.map { case (table, protectVs) =>
        Manifest.vacuum(spark, s"$root/$table", keepTables, protectVs)
      }.sum
      (dropPubs.size, filesDeleted)
    }
  }

  /** A RESOLVED publication: every `readTable` on the same snapshot
    * serves the same pinned version set, no matter how many publishes
    * land in between. This is the handle a multi-table query must use —
    * two bare [[Publication.readTable]] calls each re-resolve the
    * latest publication and can STRADDLE a publish (fact from pub N,
    * mart from pub N+1), which is exactly the mixed read publications
    * exist to prevent. Resolve once, read many.
    */
  final case class Snapshot(root: String, version: Long,
      pins: Map[String, Long]) {
    def readTable(spark: SparkSession, table: String): DataFrame = {
      val v = pins.getOrElse(table,
        throw new IllegalArgumentException(
          s"table $table is not in publication v$version of $root " +
            s"(${pins.keys.toSeq.sorted.mkString(", ")})"))
      Manifest.readAsOf(spark, s"$root/$table", v)
    }
  }

  /** Resolve the latest publication ONCE into a [[Snapshot]] handle. */
  def snapshot(spark: SparkSession, root: String): Snapshot = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no publication under $root — nothing consistent to read"))
    Snapshot(root, v, resolveAsOf(spark, root, v))
  }

  def snapshotAsOf(spark: SparkSession, root: String, v: Long): Snapshot =
    Snapshot(root, v, resolveAsOf(spark, root, v))

  /** Read `table` AS OF the latest publication — the star-consistent
    * read path for a SINGLE-table read. A table the publication does
    * not name is a loud error: silently falling back to its latest
    * version would reintroduce exactly the mixed-snapshot read this
    * exists to prevent. For a query touching SEVERAL tables, resolve a
    * [[snapshot]] once and read all tables through it — independent
    * `readTable` calls can straddle a publish.
    */
  def readTable(spark: SparkSession, root: String,
      table: String): DataFrame =
    snapshot(spark, root).readTable(spark, table)
}
