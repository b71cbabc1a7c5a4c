package graft

/** Cluster-endpoint configuration — the reference's global
  * host/port/user defaults with caller-scope override
  * (`/root/reference/R/DataFrameOperationR.R:13-17` declares the
  * defaults; `:21-23` shows every entry point rebinding them from its
  * own arguments before building the WebHDFS client and `hdfs://` URI
  * prefix, `:24-30`).
  *
  * Spark-native shape: the endpoints exist only to *name* filesystems —
  * Spark's Hadoop FS client does the actual I/O — so the config is a
  * plain immutable case class whose job is (a) holding the resolved
  * endpoint values and (b) normalizing `hdfs://host:port/...` paths the
  * way the reference's `gsub(hdfspath,'',path)` does, so manifest
  * locations written with a fully-qualified authority resolve through
  * whatever filesystem the session mounts.
  *
  * Override precedence (strongest first): explicit argument >
  * environment variable > built-in default — the Spark re-expression of
  * the reference's caller-scope shadowing.
  */
final case class GraftConfig(
    hadoopHost: String = GraftConfig.DefaultHost,
    hdfsPort: String = GraftConfig.DefaultHdfsPort,
    webHdfsPort: String = GraftConfig.DefaultWebHdfsPort,
    hdfsUser: String = GraftConfig.DefaultUser) {

  /** `hdfs://host:port` — the reference's `hdfspath` (`:28`). */
  def hdfsUri: String = s"hdfs://$hadoopHost:$hdfsPort"

  /** `http://host:webhdfsPort/webhdfs/v1` — the reference's `client`
    * (`:27`). Kept for manifest parity; the engine never speaks HTTP
    * itself (Spark's FS layer subsumes WebHDFS). */
  def webHdfsUri: String = s"http://$hadoopHost:$webHdfsPort/webhdfs/v1"

  /** Reference parity for `gsub(hdfspath,'',path)` (`:29`): strip this
    * cluster's authority prefix so the remainder resolves through the
    * session's default filesystem. Paths under any *other* authority
    * (or none) pass through untouched — including a LONGER authority
    * that merely starts with this one's text (`hdfs://nn:80201/x` must
    * not match `hdfs://nn:8020`), so the prefix only counts when it is
    * followed by `/` or is the whole string. */
  def resolvePath(path: String): String =
    if (path == hdfsUri) "/"
    else if (path.startsWith(hdfsUri + "/")) path.substring(hdfsUri.length)
    else path
}

object GraftConfig {
  // the reference's built-in defaults (`R/DataFrameOperationR.R:14-17`),
  // host neutralized: a hard-coded public IP is a config smell, and the
  // mechanism (default → env → explicit) is the behavior under parity
  val DefaultHost = "localhost"
  val DefaultHdfsPort = "9000"
  val DefaultWebHdfsPort = "50070"
  val DefaultUser = "hduser"

  val EnvHost = "GRAFT_HADOOP_HOST"
  val EnvHdfsPort = "GRAFT_HDFS_PORT"
  val EnvWebHdfsPort = "GRAFT_WEBHDFS_PORT"
  val EnvUser = "GRAFT_HDFS_USER"

  /** Where persisted index artifacts live
    * ([[graft.io.ArtifactStore]]): unset → a user-scoped dir under
    * `java.io.tmpdir`; on a cluster, point it at a durable shared
    * filesystem so one training serves every job. */
  val EnvArtifactDir = "GRAFT_ARTIFACT_DIR"

  /** Resolve with the documented precedence: explicit argument > env
    * var > default. `env` is injectable for tests. */
  def resolve(
      hadoopHost: Option[String] = None,
      hdfsPort: Option[String] = None,
      webHdfsPort: Option[String] = None,
      hdfsUser: Option[String] = None,
      env: Map[String, String] = sys.env): GraftConfig =
    GraftConfig(
      hadoopHost = hadoopHost.orElse(env.get(EnvHost)).getOrElse(DefaultHost),
      hdfsPort = hdfsPort.orElse(env.get(EnvHdfsPort)).getOrElse(DefaultHdfsPort),
      webHdfsPort = webHdfsPort.orElse(env.get(EnvWebHdfsPort))
        .getOrElse(DefaultWebHdfsPort),
      hdfsUser = hdfsUser.orElse(env.get(EnvUser)).getOrElse(DefaultUser))
}
