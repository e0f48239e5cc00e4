package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing ([EXT], SURVEY §7): image/audio/video
  * payloads ride the pipeline as opaque `binary` columns plus a typed
  * metadata struct; decode / feature-extraction / resize / frame-sample
  * run as per-partition batch transforms over the binary column.
  *
  * The decode step itself is a clearly-marked STUB (the container ships
  * no image/audio codecs): it derives a deterministic fake feature
  * vector from the payload bytes. Everything around it — schema,
  * partition-parallel batch shape, explode-based frame fan-out,
  * metadata extraction — is the real Spark plumbing a codec would slot
  * into (swap [[stubDecode]] for the JNI/codec call; on PySpark this is
  * the `mapInPandas` batch seam).
  *
  * Scale notes: payload bytes never reach the driver; metadata
  * extraction is codegen'd column work; the per-partition decode is
  * embarrassingly parallel and sized by
  * `spark.sql.files.maxPartitionBytes` at the scan.
  */
object MultimodalOps {

  /** Media-table schema: the typed contract for binary columns. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("sha256", StringType, nullable = false),
      StructField("mime", StringType, nullable = false))), nullable = false)))

  /** Fabricate a deterministic media table from the documents corpus:
    * UTF-8 payload bytes stand in for encoded media. Real ingestion
    * would `spark.read.format("binaryFile")` and keep this exact shape.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha256"),
        concat(lit("application/x-fake-"), col("kind")).as("mime")))

  /** Metadata projection — pure column work, no decode needed. */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      col("meta.byte_len").as("byte_len"),
      col("meta.sha256").as("sha256"),
      col("meta.mime").as("mime"))

  /** STUB decode: deterministic fake "features" from payload bytes.
    * ??? -- replace with a real codec (e.g. JNI decode) — the Spark
    * seam (per-partition iterator of payloads → fixed-width vectors)
    * is what this pins down.
    */
  private[operators] def stubDecode(payload: Array[Byte], dim: Int): Array[Double] =
    Array.tabulate(dim)(i => if (payload.isEmpty) 0.0
      else (payload(i % payload.length) & 0xff) / 255.0)

  /** Per-partition batch feature extraction over the binary column.
    * Runs as a typed `mapPartitions` — one iterator per input split,
    * the same batch shape a vectorised decode would use.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, payload) => (id, stubDecode(payload, dim)) })
      .toDF("media_id", "features")
  }

  /** Frame sampling: fan one video payload out to `n` byte-range
    * "frames" via posexplode — the row-multiplying plumbing a real
    * frame decoder rides (each frame row carries its slice of bytes).
    */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_bounds", expr(
        s"""transform(sequence(0, ${n - 1}),
           |  i -> struct(i as frame_no,
           |              int(i * meta.byte_len / $n) as start,
           |              int((i + 1) * meta.byte_len / $n) as stop))""".stripMargin))
      .select(col("media_id"), posexplode(col("frame_bounds")).as(Seq("pos", "fb")))
      .select(col("media_id"), col("fb.frame_no").as("frame_no"),
        (col("fb.stop") - col("fb.start")).cast("long").as("frame_bytes"))

  /** STUB resize: byte-range truncation standing in for an image
    * resize; keeps the binary-in/binary-out transform shape.
    */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("payload",
      expr(s"substring(payload, 1, $maxBytes)"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha256"),
        col("meta.mime").as("mime")))
}
