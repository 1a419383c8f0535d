package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Sidecar metadata for persisted operator artifacts (the corpus-side
  * signature/band-key tables of the incremental dedup operators).
  *
  * A persisted blocking table is only reusable if every parameter that
  * shaped it — hash family, band count, row bits — is KNOWN to match
  * the code that consumes it; a silent mismatch produces an empty or
  * garbage candidate join, not an error. So the writer stamps a
  * `_graft_meta.json` next to the parquet files (the leading underscore
  * keeps every parquet reader from treating it as data) and the reader
  * refuses to load a table whose stamps disagree with the consuming
  * code's constants.
  *
  * The format is deliberately trivial — one flat string→string JSON
  * object, written and parsed here with no library — because the
  * contract is "exact equality of a dozen short tokens", not general
  * serialization.
  */
private[graft] object ArtifactMeta {

  val FileName = "_graft_meta.json"

  private def validToken(s: String): Boolean =
    s.nonEmpty && s.forall(c => c != '"' && c != '\\' && c >= ' ')

  /** Writes `kv` as the artifact's metadata sidecar (overwrites). */
  def write(spark: SparkSession, dir: String, kv: Map[String, String]): Unit = {
    require(kv.forall { case (k, v) => validToken(k) && validToken(v) },
      s"ArtifactMeta values must be simple unescaped tokens, got $kv")
    val json = kv.toSeq.sorted
      .map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Reads the sidecar; fails loudly when it is missing (an un-stamped
    * directory is NOT a graft artifact — refusing beats guessing). */
  def read(spark: SparkSession, dir: String): Map[String, String] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$dir has no $FileName sidecar — not a graft artifact directory " +
        "(write it with the matching write*Table method)")
    val in = fs.open(p)
    val json =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toString("UTF-8")
      } finally in.close()
    val Pair = """"([^"]*)":"([^"]*)"""".r
    Pair.findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Asserts that every entry of `expected` matches the stored sidecar —
    * the fail-loud load check. `what` names the artifact in the error. */
  def check(spark: SparkSession, dir: String, what: String,
            expected: Map[String, String]): Map[String, String] = {
    val got = read(spark, dir)
    val bad = expected.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      got.get(k) match {
        case Some(`v`) => None
        case other => Some(s"$k: artifact has ${other.getOrElse("<absent>")}, " +
          s"this build expects $v")
      }
    }
    require(bad.isEmpty,
      s"$what at $dir was written with incompatible parameters — rebuild " +
        s"it with this build's write method. Mismatches: ${bad.mkString("; ")}")
    got
  }
}
