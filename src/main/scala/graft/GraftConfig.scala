package graft

/** O13: config-driven operator parameters, mirroring the reference's
  * `application.properties:2-16` — column-family allowlist
  * (`hbase_column_family`), rowkey field (`solr_hbase_rowkey_name`), flush
  * thresholds (`add_batchCount`, `del_batchCount`), commit interval
  * (`interval_commit_index`) and the flush timer's initial delay
  * (`first_delay`, SolrIndexTools.java:48 — the streaming merges' first
  * commit waits it out, `IncrementalIndex.start`). The connection-level
  * keys (`solr_url`, `is_solrcloud`) configure the reference's Solr CLIENT
  * and have no equivalent in a library that IS the index engine
  * (SURVEY.md §2 O12).
  *
  * `SparkEntry.queries` pins [[GraftConfig.default]] so the oracle rows are
  * a fixed instantiation; `graft.api.Graft` accepts any binding.
  */
final case class GraftConfig(
    cfAllowlist: Seq[String],
    rowkeyField: String,
    deleteClass: String,
    addBatchCount: Int,
    delBatchCount: Int,
    commitIntervalSec: Int,
    firstDelaySec: Int = 10) {
  require(cfAllowlist.nonEmpty, "cfAllowlist must name at least one column family")
  require(addBatchCount > 0 && delBatchCount > 0 && commitIntervalSec > 0,
    "thresholds and interval must be positive")
  require(firstDelaySec >= 0, "first_delay must be non-negative")
}

object GraftConfig {

  /** The fixture binding (FIXTURES.md): `event_type` plays the column
    * family, `user_id` the rowkey, `error` events model deletes; the
    * thresholds are the reference's shipped values. */
  val default: GraftConfig = GraftConfig(
    cfAllowlist = Seq("click", "purchase", "view"),
    rowkeyField = "user_id",
    deleteClass = "error",
    addBatchCount = 10000,
    delBatchCount = 2000,
    commitIntervalSec = 30,
    firstDelaySec = 10)

  /** Read a config from properties, using the reference's own key names;
    * missing keys keep the default binding. `delete_event_class` is ours —
    * the reference signals deletes structurally (postDelete), which a
    * changelog table needs a marker value for. */
  def fromProperties(p: java.util.Properties): GraftConfig = {
    def get(key: String, dflt: String): String =
      Option(p.getProperty(key)).map(_.trim).filter(_.nonEmpty).getOrElse(dflt)
    GraftConfig(
      cfAllowlist = get("hbase_column_family", default.cfAllowlist.mkString(","))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      rowkeyField = get("solr_hbase_rowkey_name", default.rowkeyField),
      deleteClass = get("delete_event_class", default.deleteClass),
      addBatchCount = get("add_batchCount", default.addBatchCount.toString).toInt,
      delBatchCount = get("del_batchCount", default.delBatchCount.toString).toInt,
      commitIntervalSec = get("interval_commit_index", default.commitIntervalSec.toString).toInt,
      firstDelaySec = get("first_delay", default.firstDelaySec.toString).toInt)
  }

  /** Load a `.properties` file (the reference's config format). */
  def load(path: String): GraftConfig = {
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    fromProperties(props)
  }
}
