package graft.model

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog save/load round-trip: the V2 restore path. */
class PipelineCatalogSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val full = PipelineSpec(
    name = "route-1",
    route = Route("src-east", "dst-west", 3),
    topics = Seq("click", "view"),
    topicMapping = Map("click" -> "click_v2", "view" -> "view_v2"),
    dstPartitionCounts = Map("click_v2" -> 64, "view_v2" -> 32),
    topicBlacklist = Set("junk"),
    partitionBlacklist = Set(("click", 7), ("view", 0)),
    excludeTopicRegex = Some("^__.*"),
    offsetRanges = Seq(
      OffsetRange("click", 0, 100L, Some(500L)),
      OffsetRange("click", 1, 0L, None)),
    maxOffsetsPerTrigger = Some(250000L),
    checkpointLocation = Some("/ckpt/route-1"))

  private val minimal = PipelineSpec(
    name = "route-min", route = Route("a", "b", 0),
    topics = Nil, excludeTopicRegex = None)

  test("save/load round-trips every field, including empty optionals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_catalog_").toString
    PipelineCatalog.save(spark, Seq(full, minimal), s"$dir/catalog")
    val loaded = PipelineCatalog.load(spark, s"$dir/catalog")
    assert(loaded == Seq(full, minimal).sortBy(_.name))
  }

  test("backup dumpCatalog -> load -> manager.update restores the spec registry") {
    import graft.streaming.{PipelineManager, StateBackupManager}
    val dir = java.nio.file.Files.createTempDirectory("graft_restore_").toString
    val m1 = new PipelineManager(spark)
    m1.update(full); m1.update(minimal)
    new StateBackupManager(m1, dir).dumpCatalog(spark)
    // fresh driver: restore the registry from the backup
    val m2 = new PipelineManager(spark)
    PipelineCatalog.load(spark, s"$dir/catalog").foreach(m2.update)
    assert(m2.allSpecs == m1.allSpecs)
    assert(m2.spec("route-1").get.offsetRanges == full.offsetRanges)
  }

  test("a restored spec restarts a pipeline identically (dto is lossless)") {
    val dto = PipelineCatalog.toDto(full)
    assert(PipelineCatalog.fromDto(dto) == full)
    // bounded-range semantics survive the round-trip
    val r = PipelineCatalog.fromDto(dto).offsetRanges.head
    assert(r.bounded && r.contains(250L) && !r.contains(500L))
  }
}
