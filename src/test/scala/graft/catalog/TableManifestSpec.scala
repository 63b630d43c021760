package graft.catalog

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Manifest JSON round-trip: whatever a stage commits, a reader (or a
  * resumed build) must parse back identically — including keys/values
  * with quotes and backslashes. Seeded-random property style. */
class TableManifestSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(11)
  private val chars = "abcZ09\"\\/.-_ ".toCharArray

  private def randStr(max: Int): String =
    new String(Array.fill(rnd.nextInt(max))(chars(rnd.nextInt(chars.length))))

  test("toJson → commit → read round-trips (300 randomized manifests)") {
    val dir = Files.createTempDirectory("graft-manifest").toString
    (1 to 300).foreach { _ =>
      val files = (0 until rnd.nextInt(4)).map(i =>
        FileLineage(s"part-$i-${randStr(8)}.parquet", rnd.nextInt(1000).toLong,
          rnd.nextInt(100000).toLong))
      val cfg = (0 until rnd.nextInt(5)).map(i => s"k$i${randStr(4)}" -> randStr(12)).toMap
      val m = TableManifest(randStr(10), rnd.nextLong(), files.map(_.rows).sum, files, cfg)
      TableManifest.commit(dir, m)
      val back = TableManifest.read(dir)
      assert(back.stage == m.stage, s"stage: <${m.stage}>")
      assert(back.snapshotId == m.snapshotId)
      assert(back.parentSnapshotId == m.parentSnapshotId)
      assert(back.rows == m.rows)
      assert(back.files == m.files, s"files: ${m.files}")
      assert(back.config == m.config, s"config: ${m.config}")
    }
  }

  test("snapshot ids are content-addressed: same inputs → same id, any change → new id") {
    val files = Seq(FileLineage("a.parquet", 10, 100))
    val a = TableManifest("docs", 1L, 10, files, Map("k" -> "v"))
    val b = TableManifest("docs", 1L, 10, files, Map("k" -> "v"))
    assert(a.snapshotId == b.snapshotId)
    assert(TableManifest("docs", 2L, 10, files, Map("k" -> "v")).snapshotId != a.snapshotId)
    assert(TableManifest("docs", 1L, 10, files, Map("k" -> "w")).snapshotId != a.snapshotId)
    assert(TableManifest("docs", 1L, 10,
      Seq(FileLineage("a.parquet", 10, 101)), Map("k" -> "v")).snapshotId != a.snapshotId)
  }
}
