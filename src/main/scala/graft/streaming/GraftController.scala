package graft.streaming

import graft.sources.TopicCatalogObserver
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The whole control plane wired together and started/stopped as one unit
 * — the analog of the reference's `ControllerStarter` booting a
 * `ControllerInstance` (`controller/ControllerStarter.java:49-90`,
 * `controller/ControllerInstance.java:71-118,163-216`): route manager,
 * crash supervisor, auto-whitelisting loop, 60-s validation loop, state
 * backup loop, optional consumer-group expiry loop and the REST surface
 * on a real port.
 *
 * Every component remains independently constructible (the specs drive
 * them standalone); this class only owns construction order, start order
 * (manager services before the REST surface, mirroring
 * `ControllerInstance.start`) and reverse-order shutdown. Thunk
 * parameters (`idealView`/`externalView`/`blacklist`/`isLeader`) keep
 * deployment-specific observation pluggable, like the reference's
 * cluster-specific Helix/ZK wiring. For a real multi-controller
 * deployment pass [[LeaseElection.isLeader]] — an atomic file-lease
 * election with TTL failover; both the validation loop AND the state
 * backup writer are gated on it (exactly one writer per backup dir).
 *
 * Driver-side control plane only — no data-plane rows ever pass through
 * these components.
 */
final class GraftController(
    spark: SparkSession,
    srcObserver: TopicCatalogObserver,
    dstObserver: TopicCatalogObserver,
    idealView: () => DataFrame,
    externalView: () => DataFrame,
    backupDir: String,
    blacklist: () => Set[String] = () => Set.empty,
    admission: Option[AdmissionControl] = None,
    feeds: Option[AdminApi.MonitorFeeds] = None,
    isLeader: () => Boolean = () => true,
    fencingToken: () => Long = () => -1L,
    gitBackup: Boolean = false,
    httpPort: Int = 0,
    groupExpiry: Option[(String, Long)] = None) {

  val manager = new PipelineManager(spark)
  val supervisor = new RouteSupervisor(manager)
  val whitelister =
    new AutoWhitelister(manager, srcObserver, dstObserver, blacklist)
  val validation = new ValidationService(idealView, externalView, isLeader)
  val backup =
    new StateBackupManager(manager, backupDir, gitBackup, isLeader, fencingToken)
  // (logRoot, ttlMillis): the offsets.retention.minutes analog over the
  // topic-log's consumer groups — leader-gated like validation/backup,
  // so one controller applies retention policy per log root
  val expiry = groupExpiry.map { case (root, ttl) =>
    new GroupExpiryService(root, ttl, isLeader)
  }
  val api = new AdminApi(manager, admission, feeds,
    groupRoot = groupExpiry.map(_._1), expiry = expiry, isLeader = isLeader)
  val http = new AdminHttpServer(api, Some(validation), httpPort)

  @volatile private var started = false

  /** Bound REST port (ephemeral when constructed with `httpPort = 0`). */
  def boundPort: Int = http.boundPort

  /** Start the service loops and the REST surface. `whitelistPipeline`
    * names the route the F1 loop feeds (None = no auto-whitelisting,
    * the reference's `enableAutoWhitelist=false` path). */
  def start(
      whitelistPipeline: Option[String] = None,
      validationPeriodSeconds: Long = 60,
      whitelistPeriodSeconds: Long = 600,
      backupPeriodSeconds: Long = 3600): Unit = synchronized {
    require(!started, "controller already started")
    spark.streams.addListener(supervisor)
    validation.start(validationPeriodSeconds)
    whitelistPipeline.foreach(whitelister.start(_, whitelistPeriodSeconds))
    backup.start(backupPeriodSeconds)
    expiry.foreach(_.start())
    http.start()
    started = true
  }

  /** Reverse-order shutdown; also stops every route the manager owns. */
  def stop(): Unit = synchronized {
    if (started) {
      http.stop()
      expiry.foreach(_.stop())
      backup.stop()
      whitelister.stop()
      validation.stop()
      spark.streams.removeListener(supervisor)
      started = false
    }
    manager.shutdown()
  }
}
