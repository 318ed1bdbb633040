package graft.catalog

/** THE one definition of the warehouse's name→path convention
  * (`root/<namespace>/<table>`), shared by the catalog, the CALL
  * procedures, and the name-addressed streaming entry points — three
  * independent spellings of this join would drift apart the first time
  * the convention changes.
  */
object GraftPaths {

  def tablePath(root: String, namespace: String, table: String): String =
    s"${root.stripSuffix("/")}/$namespace/$table"

  /** `"<namespace>.<table>"` → path under `root`. */
  def tablePathOf(root: String, qualified: String): String = {
    val parts = qualified.split("\\.")
    require(parts.length == 2,
      s"expected '<namespace>.<table>', got '$qualified'")
    tablePath(root, parts(0), parts(1))
  }
}
