package graft.core

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** YAML → pipeline specs, mirroring the reference's config surface
  * (`cmd/migrator/config.go:12-43`, loader `config.go:56-65` in
  * /root/reference) with defaults applied the same way
  * (`LoadConfigWithDefaults`). Key names follow the reference's YAML
  * (`testdata/delete-enabled-queuing.yml`): `extractor`, `transformer`,
  * `parameters: {BatchSize: …, SequentialReplace: …, TableName: …}`.
  *
  * Example:
  * {{{
  * pipelines:
  *   - source-database: a
  *     source-table: x
  *     key: id
  *     destination-database: b
  *     destination-table: x
  *     source-path: /data/src
  *     destination-path: /data/dst
  *     extractor: sequential
  *     transformer: default
  *     parameters:
  *       BatchSize: 1000
  *       SequentialReplace: true
  * }}}
  */
object Config {

  /** Whole config file: pipelines plus the engine-level settings the
    * reference keeps at the root (`TrackingTableName`,
    * `cmd/migrator/main.go:35` — here a tracking PATH, since position
    * state lives in a table directory, not a MySQL table name).
    */
  final case class Loaded(pipelines: Seq[PipelineSpec],
                          trackingPath: Option[String])

  def parse(yaml: String): Seq[PipelineSpec] = parseFull(yaml).pipelines

  def parseFull(yaml: String): Loaded = {
    val root = new Yaml().load[java.util.Map[String, Any]](yaml)
    require(root != null && root.containsKey("pipelines"),
      "config needs a top-level `pipelines` list")
    Loaded(
      root.get("pipelines").asInstanceOf[java.util.List[java.util.Map[String, Any]]]
        .asScala.toSeq.map(parsePipeline),
      Option(root.get("tracking-path")).map(_.toString))
  }

  def load(path: String): Seq[PipelineSpec] = loadFull(path).pipelines

  def loadFull(path: String): Loaded =
    parseFull(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private def parsePipeline(m: java.util.Map[String, Any]): PipelineSpec = {
    val sm = m.asScala
    def str(k: String): String = sm.get(k).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"pipeline config missing `$k`"))
    def opt(k: String): Option[String] = sm.get(k).map(_.toString)

    val params = sm.get("parameters")
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
      .getOrElse(Map.empty[String, Any])
    def p[T](k: String, default: T, f: Any => T): T =
      params.get(k).map(f).getOrElse(default)

    val spec = PipelineSpec(
      sourceDatabase = str("source-database"),
      sourceTable = str("source-table"),
      sourceKey = str("key"),
      destinationDatabase = opt("destination-database").getOrElse(str("source-database")),
      destinationTable = opt("destination-table").getOrElse(str("source-table")),
      sourcePath = str("source-path"),
      destinationPath = str("destination-path"),
      extractor = opt("extractor").getOrElse("sequential"),
      transformer = opt("transformer").getOrElse("default"),
      queuePath = opt("queue-path"),
      primaryKey = opt("primary-key"),
      params = Params(
        batchSize = p("BatchSize", 1000, _.toString.toInt),
        insertBatchSize = p("InsertBatchSize", 1000, _.toString.toInt),
        sleepBetweenRunsSec = p("SleepBetweenRuns", 5.0, _.toString.toDouble),
        onlyPast = p("OnlyPast", false, _.toString.toBoolean),
        sequentialReplace = p("SequentialReplace", false, _.toString.toBoolean),
        partitionBuckets = p("PartitionBuckets", Params.AutoBuckets, _.toString.toInt),
        partitionByCol = params.get("PartitionBy").map(_.toString),
        compactFileThreshold = p("CompactFileThreshold", 0, _.toString.toInt),
        tableName = params.get("TableName").map(_.toString),
        expressions = params.get("Expressions")
          .map(_.asInstanceOf[java.util.Map[String, Any]].asScala
            .map { case (k, v) => k -> v.toString }.toMap)
          .getOrElse(Map.empty),
        extra = params.collect {
          case (k, v) if !Set("BatchSize", "InsertBatchSize", "SleepBetweenRuns",
            "OnlyPast", "SequentialReplace", "TableName", "Expressions",
            "PartitionBuckets", "PartitionBy", "CompactFileThreshold")(k) =>
            k -> String.valueOf(v)
        }.toMap))

    // fail-fast registry validation (`cmd/migrator/main.go:61-82`)
    Registry.extractor(spec.extractor)
    Registry.transformer(spec.transformer)
    // the two destination layouts are mutually exclusive; resolving a
    // contradiction by silent precedence would leave the user to
    // discover the wrong layout from the directory tree
    require(spec.params.partitionByCol.isEmpty ||
      spec.params.partitionBuckets == Params.AutoBuckets,
      s"pipeline ${spec.sourceTable}: PartitionBy and PartitionBuckets " +
        "are mutually exclusive destination layouts — configure one")
    spec
  }
}
