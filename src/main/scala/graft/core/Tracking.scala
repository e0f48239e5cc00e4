package graft.core

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-(source db, source table) stream position — reference
  * `TrackingStatus` (`tracking.go:12-20`), persisted schema parity with
  * `tracking.sql:1-9`.
  */
final case class TrackingStatus(
    sourceDatabase: String,
    sourceTable: String,
    columnName: String,
    sequentialPosition: Long = 0L,
    timestampPosition: Option[Timestamp] = None,
    lastRun: Option[Timestamp] = None)

/** Parquet-backed tracking table (reference `EtlPosition`,
  * `tracking.go:33-45`): bootstrap-if-missing, point reads, and
  * committed-snapshot updates.
  *
  * Updates stage the new snapshot to a versioned subdirectory and flip a
  * pointer file last, so a crash mid-write never corrupts the previous
  * snapshot (the reference gets durability from MySQL transactions; on a
  * real deployment this component would be a Delta table and commit via
  * its log).
  *
  * The table is O(#pipelines) rows — never a scale concern.
  */
final class TrackingStore(spark: SparkSession, root: String) {

  private val schema = StructType(Seq(
    StructField("sourceDatabase", StringType, nullable = false),
    StructField("sourceTable", StringType, nullable = false),
    StructField("columnName", StringType, nullable = false),
    StructField("sequentialPosition", LongType, nullable = false),
    StructField("timestampPosition", TimestampType, nullable = true),
    StructField("lastRun", TimestampType, nullable = true)))

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs = new Path(root).getFileSystem(hconf)
  private val pointer = new Path(root, "_CURRENT")

  /** In-memory image of the (tiny, O(#pipelines)) table, loaded once and
    * kept in sync by `put` — point reads and commits then cost zero
    * Spark jobs beyond the snapshot write. The store is owned by one
    * runner; an external writer would require dropping this cache.
    */
  private var cached: Option[Vector[TrackingStatus]] = None

  private def loadAll(): Vector[TrackingStatus] = synchronized {
    cached.getOrElse {
      val v = currentSnapshot() match {
        case Some(ver) => spark.read.schema(schema).parquet(s"$root/$ver")
          .collect().toVector.map(fromRow)
        case None => Vector.empty
      }
      cached = Some(v)
      v
    }
  }

  /** Numeric snapshot version from a `v<number>` dir name; unparseable
    * names sort lowest. Parsing (instead of lexicographic name order)
    * matters because an unpadded or negative numeric suffix — e.g. the
    * raw `nanoTime` names older builds wrote, whose origin is arbitrary
    * per JVM — would make "newest by name" resurrect an OLDER snapshot
    * after a crash in a new JVM, regressing every pipeline position and
    * replaying whole tables as duplicate INSERTs.
    */
  private def versionNum(name: String): Long =
    try name.drop(1).toLong catch { case _: NumberFormatException => Long.MinValue }

  private def currentSnapshot(): Option[String] = {
    if (!fs.exists(pointer)) {
      // pointer lost (e.g. crash on a filesystem without atomic rename):
      // recover the newest snapshot dir — losing the pointer must not
      // reset every pipeline position to the seed (which would replay
      // whole tables as duplicate INSERTs)
      if (!fs.exists(new Path(root))) return None
      val vs = fs.listStatus(new Path(root)).map(_.getPath.getName)
        .filter(_.startsWith("v")).sortBy(versionNum)
      return vs.lastOption
    }
    val in = fs.open(pointer)
    try {
      val v = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
      if (v.isEmpty) None else Some(v)
    } finally in.close()
  }

  /** All tracking rows (empty DataFrame with the right schema if the
    * store was never written).
    */
  def all(): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(loadAll().map(toRow), 1), schema)

  /** Point read — reference `GetTrackingStatus` (`tracking.go:59-64`). */
  def get(sourceDatabase: String, sourceTable: String): Option[TrackingStatus] =
    loadAll().find(t =>
      t.sourceDatabase == sourceDatabase && t.sourceTable == sourceTable)

  /** Bootstrap a fresh row if none exists — reference seeds at init
    * (`migrator.go:236-264`) with position 0, which under the strict-`>`
    * watermark silently skips key 0 (fine for MySQL SERIAL, which starts
    * at 1). We seed at Long.MinValue so "nothing consumed yet" holds for
    * any integral key domain — a deliberate semantic fix.
    */
  def getOrSeed(sourceDatabase: String, sourceTable: String, columnName: String): TrackingStatus =
    get(sourceDatabase, sourceTable).getOrElse {
      val seeded = TrackingStatus(sourceDatabase, sourceTable, columnName,
        sequentialPosition = Long.MinValue)
      put(seeded)
      seeded
    }

  /** Upsert one row and atomically flip to the new snapshot — reference
    * `SerializeTrackingStatus` (`tracking.go:91-95`), but committed
    * *after* load per the corrected ordering (`TODO.md:4-11`).
    */
  def put(ts: TrackingStatus): Unit = synchronized {
    val rows = loadAll().filterNot(t =>
      t.sourceDatabase == ts.sourceDatabase &&
        t.sourceTable == ts.sourceTable) :+ ts
    val prev = currentSnapshot()
    // strictly-increasing persisted version: one past the newest existing
    // snapshot (recovery then picks the true latest by numeric order even
    // with the pointer gone — see versionNum)
    val next = s"v${math.max(prev.map(versionNum).getOrElse(0L), 0L) + 1L}"
    spark
      .createDataFrame(spark.sparkContext.parallelize(rows.map(toRow), 1), schema)
      .write.mode("overwrite").parquet(s"$root/$next")
    cached = Some(rows.toVector)
    val tmp = new Path(root, s"_CURRENT.tmp${ParquetTable.stamp()}")
    val out = fs.create(tmp, true)
    try out.write(next.getBytes("UTF-8")) finally out.close()
    // atomic overwrite-rename (FileContext supports Rename.OVERWRITE;
    // plain FileSystem.rename would need a delete first, leaving a crash
    // window with no pointer at all)
    org.apache.hadoop.fs.FileContext.getFileContext(pointer.toUri, hconf)
      .rename(tmp, pointer, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // GC the superseded snapshot — a long drain commits every batch and
    // would otherwise accumulate one tiny dir per micro-batch forever
    prev.filter(_ != next).foreach(v => fs.delete(new Path(root, v), true))
  }

  private def toRow(t: TrackingStatus): Row = Row(
    t.sourceDatabase, t.sourceTable, t.columnName, t.sequentialPosition,
    t.timestampPosition.orNull, t.lastRun.orNull)

  private def fromRow(r: Row): TrackingStatus = TrackingStatus(
    r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
    Option(r.get(4)).map(_.asInstanceOf[Timestamp]),
    Option(r.get(5)).map(_.asInstanceOf[Timestamp]))
}
