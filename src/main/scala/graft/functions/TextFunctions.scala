package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash primitives for the LLM-data-pipeline operators
  * (dedup, fingerprinting, minhash/simhash, quality scoring).
  *
  * Engine-parity design: every primitive is computed from `md5` hex — the
  * one hash both Spark and DuckDB implement bit-identically — parsed to
  * integers via hex→decimal conversion. Spark: `conv(substring(md5(x),..),
  * 16, 10)`; DuckDB: `CAST('0x' || substr(md5(x),..) AS BIGINT)`. Verified
  * equal on both engines. Everything downstream is exact integer math, so
  * the DuckDB oracle can hash-match signatures, buckets and fingerprints.
  *
  * All builders return codegen-friendly Catalyst expressions (built-in
  * functions + higher-order array lambdas) — no UDFs anywhere.
  */
object TextFunctions {

  /** 44-bit md5-derived hash (11 hex digits). Small enough that an affine
    * permutation `a*h + b` with a < 2^19 never overflows a signed 64-bit
    * integer: 2^19 * 2^44 + 2^44 < 2^63.
    *
    * Implemented by the native [[Md5Prefix44]] expression (no per-word
    * hex-string allocation); [[h44Builtin]] is the built-in-functions
    * formulation it is property-tested against.
    */
  def h44(c: Column): Column = Md5Prefix44(c)

  /** Built-in-only twin of [[h44]] (parity reference + fallback). */
  def h44Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 11), 16, 10).cast("bigint")


  /** DuckDB mirror of [[h44]]. */
  def h44Sql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 11)) AS BIGINT)"

  /** 60-bit md5-derived hash (15 hex digits) for fingerprints. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  def h60Sql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** Lowercased word tokens, empties removed. Same split + filter on the
    * oracle side ([[wordsSql]]); both engines keep interior/trailing empty
    * strings from the split, so the explicit filter keeps them aligned.
    */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => w =!= "")

  def wordsSql(x: String): String =
    s"list_filter(string_split_regex(lower($x), '[^a-z0-9]+'), w -> w <> '')"

  // ---- MinHash ----------------------------------------------------------

  /** Signature length (k) and LSH banding (b bands × r rows = k). */
  val MinhashK = 12
  val MinhashBands = 2
  val MinhashRows = 6

  /** Affine permutation constants, fixed-seed deterministic; a odd in
    * [3, 2^19), b in [0, 2^44). Embedded in BOTH the Spark plan and the
    * oracle SQL, so hash-function parity is by construction.
    */
  val minhashPerms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eedL)
    val perms = Seq.fill(MinhashK)((rnd.nextInt((1 << 18) - 2).toLong * 2 + 3,
      math.abs(rnd.nextLong()) % (1L << 44)))
    // the overflow-safety proof (a*h+b < 2^63) requires a < 2^19
    perms.foreach { case (a, _) => require(a < (1L << 19), s"perm a=$a") }
    perms
  }

  private val M44 = 1L << 44

  /** MinHash signature (array of k minima) over a distinct word array.
    *
    * Implemented by the native [[MinHashSig]] expression (one pass,
    * whole-stage codegen); [[minhashSigBuiltin]] is the HOF
    * formulation it is property-tested against.
    */
  def minhashSig(wordsArr: Column): Column = MinHashSig(wordsArr)

  /** Built-in-only twin of [[minhashSig]] (parity reference). */
  def minhashSigBuiltin(wordsArr: Column): Column = {
    val hashes = transform(wordsArr, w => h44(w))
    array(minhashPerms.map { case (a, b) =>
      array_min(transform(hashes, h => (h * a + b) % M44))
    }: _*)
  }

  /** DuckDB mirror of [[minhashSig]] — `ws` must be a distinct word list. */
  def minhashSigSql(ws: String): String = {
    val perHash = minhashPerms.map { case (a, b) =>
      s"list_min(list_transform($ws, w -> (${h44Sql("w")} * $a + $b) % $M44))"
    }
    perHash.mkString("[", ", ", "]")
  }

  // ---- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over pre-hashed DISTINCT words of a document: bit i
    * is set when the sum over word hashes of (bit i ? +1 : -1) is
    * positive. Unweighted (set semantics) — the standard variant for
    * near-dup fingerprinting of short documents. `hsCol` names a
    * bigint-array column of word hashes in scope — hash ONCE, outside
    * the 32-bit loop (recomputing md5 inside it is a 30× slowdown,
    * measured).
    *
    * Implemented by the native [[SimHash32]] expression (one primitive
    * pass, whole-stage codegen); [[simhash32Builtin]] is the
    * HOF formulation it is property-tested against.
    */
  def simhash32(hsCol: String): Column = SimHash32(col(hsCol))

  /** Built-in-only twin of [[simhash32]] (parity reference). */
  def simhash32Builtin(hsCol: String): Column = expr(s"""
    aggregate(
      zip_with(
        aggregate($hsCol, transform(sequence(0, 31), i -> 0L),
          (acc, h) -> zip_with(acc, sequence(0, 31),
            (a, i) -> a + (shiftright(h, i) & 1L) * 2L - 1L)),
        sequence(0, 31),
        (b, i) -> CASE WHEN b > 0 THEN cast(pow(2.0d, i) AS bigint)
                       ELSE 0L END),
      0L, (acc, x) -> acc + x)""")

  /** DuckDB mirror of [[simhash32]] — `hs` is a pre-hashed bigint list. */
  def simhash32Sql(hs: String): String =
    s"""CAST(list_sum(list_transform(range(0, 32), i ->
       CASE WHEN list_sum(list_transform($hs, h -> ((h >> i) & 1) * 2 - 1)) > 0
            THEN CAST(2 ** i AS BIGINT) ELSE 0 END)) AS BIGINT)"""
}
