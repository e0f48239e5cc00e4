package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic k× blow-up of an SF dir into a scratch dir — the
  * corpus for scale-cliff probes above the largest driver-provided SF
  * (PLANS.md round 8). Replica r of a row gets ids offset by r·10⁹ so
  * every id stays unique; content is decorrelated per replica rather
  * than copied, because a corpus of verbatim copies would turn every
  * dedup gate into a degenerate 45-pairs-per-doc stress that measures
  * the duplicate-set fan-out, not the operator's scaling:
  *
  *  - documents: a replica token is prepended and vowels are remapped
  *    through one of nine distinct permutations (`translate` — one
  *    codegen'd expression), so replicas of the same doc share almost
  *    no shingles; `n_chars` recomputed.
  *  - embeddings: each component scaled by a ±12% factor derived from
  *    (vec_id, component, replica) — near-dup/knn structure stays
  *    realistic instead of collapsing onto cos = 1 clusters.
  *  - events: new user universe per replica (`user_id + r·10⁶`) —
  *    sessionize/retention/funnel group counts scale linearly.
  *  - lineitem/orders: order keys offset; part/supp/cust keys KEPT, so
  *    per-key fan-in grows k× — deliberately, that is the skew stress
  *    the salted/broadcast join gates should absorb.
  *  - dimension tables copied as-is.
  *
  * Usage: `runMain graft.ScaleData <srcSfDir> <outDir> [k]` (default
  * k = 10). Output layout matches TESTDATA.md (`<table>.parquet`
  * directories), readable by [[sources.Tables.readTable]].
  */
object ScaleData {
  private val vowelMaps = Seq(
    "eioua", "iouae", "ouaei", "uaeio", "aeoui",
    "aiueo", "eauio", "oieua", "uoiea")

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1-synth"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    blowUp(spark, src, out, k)
    spark.stop()
  }

  def blowUp(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    // decorrelation budget: 9 distinct vowel maps + the identity replica.
    // Beyond that, replicas r and r+9 would share a vowel map and differ
    // only by the prefix token — near-verbatim duplicates again.
    require(k >= 1 && k <= vowelMaps.size + 1,
      s"k=$k exceeds the content-decorrelation budget (max ${vowelMaps.size + 1})")
    val reps = spark.range(k).select(col("id").cast("int").as("r"))
    def replicate(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    val off = col("r").cast("long") * 1000000000L

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaledata] $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val docs = replicate(sources.Tables.documents(spark, src))
      .withColumn("text",
        when(col("r") === 0, col("text")).otherwise(concat(
          lit("r"), col("r"), lit(" "),
          vowelMaps.zipWithIndex.foldLeft(col("text")) { case (acc, (m, i)) =>
            when(pmod(col("r") - 1, lit(vowelMaps.size)) === i,
              translate(col("text"), "aeiou", m)).otherwise(acc)
          })))
      .select((col("doc_id") + off).as("doc_id"), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
    write("documents", docs)

    // replica term r * 5 is coprime-stepped mod 13 (r * 13 would vanish
    // — bit-identical replicas, the degenerate structure this exists to
    // avoid); the lambda reads the pre-offset vec_id, so the r term is
    // the ONLY source of replica difference and must not cancel
    // r = 0 keeps the base vectors verbatim (the documents posture:
    // sf1 CONTAINS sf0.1, so cross-SF spot checks on shared ids hold)
    val emb = replicate(sources.Tables.embeddings(spark, src))
      .select((col("vec_id") + off).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          expr("transform(embedding, (x, j) -> cast(x * (1.0d + " +
            "(pmod(vec_id * 31 + j * 7 + r * 5, 13) - 6) * 0.02d) as float))"))
          .as("embedding"),
        col("label"))
    write("embeddings", emb)

    val ev = replicate(sources.Tables.events(spark, src))
      .select((col("event_id") + off).as("event_id"), col("ts"),
        (col("user_id") + col("r").cast("long") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    write("events", ev)

    val li = replicate(sources.Tables.lineitem(spark, src))
      .withColumn("l_orderkey", col("l_orderkey") + off).drop("r")
    write("lineitem", li)
    val ord = replicate(sources.Tables.orders(spark, src))
      .withColumn("o_orderkey", col("o_orderkey") + off).drop("r")
    write("orders", ord)

    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      write(t, sources.Tables.readTable(spark, src, t))
    }
  }
}
