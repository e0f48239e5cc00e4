package graft.queries

import org.apache.spark.sql.DataFrame

/** Parquet exports of trained gate-query artifacts (PQ codebooks, IVF
  * centroids/assignment, IVF-PQ codes) for the DuckDB oracle: the
  * trained state is deterministic (seeded samples, seeded k-means) and
  * BOUNDED (codebooks are m·kCent rows, centroids nlist rows, the
  * assignment/codes are the index tables a production deployment
  * persists anyway — [[graft.operators.VectorIndex]]'s layout), so the
  * oracle can `read_parquet` them and replay assignment + ADC scoring
  * in pure SQL. This is what promotes the ANN gate queries from
  * rows-only to hash-checked: the k-means TRAINING stays outside SQL,
  * but everything downstream of the trained state is replayed
  * independently.
  *
  * Flow contract (and why a mutable registry is sound here):
  * [[graft.Verify]] RUNS the gate queries first — each ANN query
  * exports its artifacts once per (dir, key) and registers the path —
  * and dumps `oracleSql` AFTER, so the interpolated paths in the
  * dumped JSON always point at artifacts written by the very run the
  * driver compares against. A query filtered out of the run is
  * filtered out of the dump symmetrically. Paths are keyed by a hash
  * of the SF dir, so verify (sf0.01) and bench (sf0.1) never clobber
  * each other's exports.
  */
private[queries] object OracleArtifacts {

  private val written =
    scala.collection.mutable.HashSet.empty[(String, String)]
  private val latest =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val dirsSeen =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  private def root: String =
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft-oracle-artifacts"

  private def dirKey(dir: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    d.take(4).map(b => f"$b%02x").mkString
  }

  /** Write `build` once per (dir, key), register the path for
    * [[pathFor]], return it. Overwrite-once semantics: the artifact is
    * deterministic for a dir, so a re-export from a second session
    * writes identical bytes.
    */
  def export(dir: String, key: String)(build: => DataFrame): String = {
    val path = s"$root/${dirKey(dir)}/$key"
    written.synchronized {
      if (!written.contains((dirKey(dir), key))) {
        build.coalesce(1).write.mode("overwrite").parquet(path)
        written.add((dirKey(dir), key))
      }
      latest.put(key, path)
      dirsSeen.put(key, dirsSeen.getOrElse(key, Set.empty) + dirKey(dir))
    }
    path
  }

  /** The most recently exported path for `key` — what the oracle SQL
    * interpolates at dump time (one dir per verify run). Falls back to
    * a recognizable dead path if the query never ran in this JVM (the
    * dump is filtered symmetrically, so this only surfaces when SQL is
    * rendered without running the queries). The dump contract
    * (`SparkEntry.oracleSql`) carries no dir, so per-dir resolution is
    * impossible here BY CONTRACT — last-writer-wins with a loud stderr
    * note when a JVM has actually exported this key for multiple dirs
    * (a test-harness shape; the driver dumps once per single-dir run).
    */
  def pathFor(key: String): String = {
    if (dirsSeen.getOrElse(key, Set.empty).size > 1)
      System.err.println(
        s"[oracle-artifacts] WARNING: '$key' was exported for " +
          s"${dirsSeen(key).size} different SF dirs in this JVM; the " +
          "dumped oracle SQL points at the most recent one")
    latest.getOrElse(key, s"$root/unregistered/$key")
  }
}
