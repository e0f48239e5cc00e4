package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.ShardedMembershipStore

class ShardedMembershipStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mk(keys: Seq[String]) = keys.toDF("k")

  private def blobBytes(path: String, i: Int): Option[Seq[Byte]] = {
    val dir = s"$path/shards/p$i"
    if (!graft.operators.IndexStores.hasStore(spark, dir)) None
    else Some(spark.read.parquet(dir).head
      .getAs[Array[Byte]]("sketch").toSeq)
  }

  test("membership contract over shards: no false negatives, unseen " +
    "keys (and absent shards) probe false, geometry drift rejects") {
    val path = tmpDir("shard-bloom") + "/store"
    val a = mk((0 until 400).map(i => s"url-$i"))
    ShardedMembershipStore.write(a, col("k"), path,
      expectedItems = 10000L, shards = 8)
    val probed = ShardedMembershipStore.seen(
      mk((0 until 400).map(i => s"url-$i") ++
        (0 until 200).map(i => s"fresh-$i")), col("k"), path)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert((0 until 400).forall(i => probed(s"url-$i")),
      "false negative — the one thing a Bloom must never do")
    val fpHits = (0 until 200).count(i => probed(s"fresh-$i"))
    assert(fpHits <= 10, s"$fpHits/200 false positives at fpp=0.01")
    // geometry / shard-count drift rejects loudly
    val e = intercept[IllegalArgumentException] {
      ShardedMembershipStore.extend(a, col("k"), path, batchId = 1L,
        expectedItems = 10000L, shards = 16)
    }
    assert(e.getMessage.contains("re-sharding"))
    // a second write over an existing store rejects
    intercept[IllegalArgumentException] {
      ShardedMembershipStore.write(a, col("k"), path, 10000L, 8)
    }
  }

  test("extend rewrites ONLY the touched shards' blobs — per-trigger " +
    "write ~ O(touched/N of store), not O(store) (VERDICT r12 #2)") {
    val path = tmpDir("shard-touch") + "/store"
    val shards = 8
    ShardedMembershipStore.write(mk((0 until 400).map(i => s"u$i")),
      col("k"), path, expectedItems = 10000L, shards = shards)
    val beforeBlobs = (0 until shards).map(i => blobBytes(path, i))
    assert(beforeBlobs.forall(_.nonEmpty), "400 keys must touch all 8")
    // a 2-key trigger: touches at most 2 shards
    ShardedMembershipStore.extend(mk(Seq("tiny-a", "tiny-b")),
      col("k"), path, batchId = 1L, expectedItems = 10000L,
      shards = shards)
    val afterBlobs = (0 until shards).map(i => blobBytes(path, i))
    val changed = (0 until shards).count(i =>
      beforeBlobs(i) != afterBlobs(i))
    assert(changed >= 1 && changed <= 2,
      s"a 2-key batch rewrote $changed of $shards blobs — the " +
        "untouched shards must be byte-identical")
    // the tiny batch's keys are now seen; accounting is exact
    assert(ShardedMembershipStore.seen(mk(Seq("tiny-a", "tiny-b")),
      col("k"), path).filter(col("seen")).count() === 2L)
    val st = ShardedMembershipStore.stats(spark, path).head
    assert(st.getAs[Long]("items_added") === 402L)
    assert(st.getAs[Long]("applied_batches") === 1L)
    // replay of the same (producer, batchId): full no-op
    ShardedMembershipStore.extend(mk(Seq("tiny-a", "tiny-b")),
      col("k"), path, batchId = 1L, expectedItems = 10000L,
      shards = shards)
    assert(ShardedMembershipStore.stats(spark, path)
      .head.getAs[Long]("items_added") === 402L)
    assert((0 until shards).forall(i =>
      blobBytes(path, i) == afterBlobs(i)), "replay touched a blob")
  }

  test("capacity: the single-blob BitArray ceiling (~14 B items at " +
    "1% fpp) is removed — per-shard geometry fits where one blob " +
    "cannot (arithmetic probe; nobody allocates 24 GB in a test)") {
    // Spark's BloomFilter BitArray is a long[] with an int length:
    // at most (2^31 - 1) * 64 bits
    val bitCeiling = (Int.MaxValue.toLong) * 64L
    val lifetimeUrls = 20000000000L // a 100 TB crawl's frontier
    val single = BloomFilter.optimalNumOfBits(lifetimeUrls, 0.01)
    assert(single > bitCeiling,
      "the motivating scale must actually exceed one blob")
    val shards = 32
    val per = ShardedMembershipStore.perShardItems(lifetimeUrls, shards)
    val perBits = BloomFilter.optimalNumOfBits(per, 0.01)
    assert(perBits < bitCeiling,
      s"per-shard $perBits bits must fit one BitArray")
    assert(per * shards >= lifetimeUrls, "sharding must not lose keys")
  }

  test("urlDedupBatch over the SHARDED seen-set: cross-trigger " +
    "suppression, within-trigger collapse, crash-replay no-op") {
    val root = tmpDir("shard-urldedup")
    val store = s"$root/seen"
    val out = s"$root/kept"
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "url")
    graft.operators.WebOps.urlDedupBatch(
      batch((1L, "http://A.com/x"), (2L, "http://a.com./x"),
        (3L, "http://b.com/y"), (4L, "notaurl")),
      store, out, batchId = 0L, expectedUrls = 100000L, seed = "s13",
      shards = 8)
    def landedIds() = spark.read.parquet(s"$out/b_*")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // within-trigger: A.com/x and a.com./x collapse to one winner;
    // the non-http row passes through
    val first = landedIds()
    assert(first.size === 3 && first.contains(3L) && first.contains(4L))
    // trigger 1: a re-crawl of a.com/x is suppressed by the sharded
    // store; a fresh URL is admitted
    graft.operators.WebOps.urlDedupBatch(
      batch((10L, "http://a.com/x"), (11L, "http://c.com/z")),
      store, out, batchId = 1L, expectedUrls = 100000L, seed = "s13",
      shards = 8)
    val second = landedIds()
    assert(second.contains(11L) && !second.contains(10L),
      s"re-crawl must be suppressed, fresh admitted: $second")
    // crash-replay of trigger 1: ledgered -> full no-op
    graft.operators.WebOps.urlDedupBatch(
      batch((10L, "http://a.com/x"), (11L, "http://c.com/z")),
      store, out, batchId = 1L, expectedUrls = 100000L, seed = "s13",
      shards = 8)
    assert(landedIds() === second)
    // the store really is the sharded layout
    val st = ShardedMembershipStore.stats(spark, store).head
    assert(st.getAs[Int]("shards") === 8)
    assert(st.getAs[Long]("applied_batches") === 2L)
    // layout tripwire (review finding): flipping the shards knob on
    // an existing path must reject BEFORE any scoring, not silently
    // abandon the seen-set history
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.WebOps.urlDedupBatch(
        batch((20L, "http://a.com/x")), store, out, batchId = 2L,
        expectedUrls = 100000L, seed = "s13") // shards defaults to 1
    }
    assert(e1.getMessage.contains("SHARDED"))
    // and the reverse: a single-blob store refuses a sharded extend
    val blobStore = s"$root/blob"
    graft.operators.WebOps.urlDedupBatch(
      batch((30L, "http://b.org/y")), blobStore, s"$root/kept2",
      batchId = 0L, expectedUrls = 1000L, seed = "s13")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.WebOps.urlDedupBatch(
        batch((31L, "http://b.org/z")), blobStore, s"$root/kept2",
        batchId = 1L, expectedUrls = 1000L, seed = "s13", shards = 8)
    }
    assert(e2.getMessage.contains("SINGLE-BLOB"))
    // the store-level tripwires fire too (not only the operator's)
    intercept[IllegalArgumentException] {
      ShardedMembershipStore.extend(batch((32L, "u")).toDF()
        .select(col("url").as("k")), col("k"), blobStore, 5L,
        1000L, 8)
    }
  }

  test("write(a); extend(b) ≡ membership of a ∪ b, and an empty " +
    "trigger still ledgers (no blob moves)") {
    val path = tmpDir("shard-union") + "/store"
    val a = mk((0 until 100).map(i => s"a$i"))
    val b = mk((0 until 100).map(i => s"b$i"))
    ShardedMembershipStore.write(a, col("k"), path, 5000L, 4)
    ShardedMembershipStore.extend(b, col("k"), path, 1L, 5000L, 4)
    val seen = ShardedMembershipStore.seen(a.unionByName(b),
      col("k"), path).agg(count(when(col("seen"), 1))).head.getLong(0)
    assert(seen === 200L, "a key of either half went missing")
    val blobsBefore = (0 until 4).map(i => blobBytes(path, i))
    ShardedMembershipStore.extend(mk(Seq.empty[String]), col("k"),
      path, 2L, 5000L, 4)
    assert((0 until 4).forall(i => blobBytes(path, i) == blobsBefore(i)))
    // write() ledgers nothing (the MembershipStore.write posture);
    // the two extends are ledgered
    assert(ShardedMembershipStore.stats(spark, path)
      .head.getAs[Long]("applied_batches") === 2L)
  }
}
