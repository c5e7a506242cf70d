package graft.tools

import java.nio.file.{Files, Paths}
import org.json4s.jackson.Serialization

import graft.icelite.{Icelite, IceliteTable}

/** Metadata write-amplification measurement for delta manifests: replays a
  * sparse-commit sequence (the 10^10-event shape: each micro-batch touches a
  * few of many buckets) against a table with `buckets` buckets and reports
  *   - delta manifest bytes actually written per commit (HEAD behavior),
  *   - the counterfactual FULL-map manifest bytes the pre-delta design
  *     would have written (serialize the resolved map per commit — computed
  *     with the same serializer, so the comparison is exact),
  *   - cold and warm full-map resolution time at the final snapshot.
  * Pure driver-side metadata — no Spark session involved.
  *
  * Run: sbt "runMain graft.tools.ManifestBench [buckets] [commits] [touchedPerCommit]"
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val buckets = args.headOption.map(_.toInt).getOrElse(1024)
    val commits = args.lift(1).map(_.toInt).getOrElse(200)
    val touched = args.lift(2).map(_.toInt).getOrElse(4)

    val dir = Files.createTempDirectory("manifestbench").toString
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), buckets)
    def df(p: String) = Icelite.DataFile(p, 0, 100, 0, 1000,
      keyFp = Some("A" * 684)) // realistic entry: 4096-bit fingerprint attached
    val sid = 0
    Files.writeString(Paths.get(s"$dir/t/metadata/schema-0.json"),
      """{"type":"struct","fields":[]}""")

    // seed: every bucket holds one file (a settled table)
    t.commit(0, sid, (0 until buckets).map(b => b -> List(df(s"seed-$b.parquet"))).toMap,
      Nil, buckets)

    var deltaBytes = 0L
    var fullBytes = 0L
    val t0 = System.nanoTime()
    (1 to commits).foreach { e =>
      val bs = (0 until touched).map(i => (e * 31 + i * 7) % buckets)
        .map(b => b -> List(df(s"d$e-$b.parquet"))).toMap
      val snap = t.commit(e, sid, bs, Nil, touched, append = true)
      deltaBytes += Files.size(Paths.get(s"$dir/t/metadata/snap-${snap.snapshotId}.json"))
      // counterfactual: what a full-map manifest for this snapshot would be
      fullBytes += Serialization.write(
        snap.copy(bucketDelta = t.bucketFilesOf(snap), full = true)).length
    }
    val commitMs = (System.nanoTime() - t0) / 1e6

    // resolution cost at the end of the chain
    val cur = t.currentSnapshot.get
    val tCold0 = System.nanoTime()
    val freshTable = IceliteTable.load(s"$dir/t") // empty cache
    val resolved = freshTable.bucketFilesOf(freshTable.currentSnapshot.get)
    val coldMs = (System.nanoTime() - tCold0) / 1e6
    val tWarm0 = System.nanoTime()
    freshTable.bucketFilesOf(freshTable.currentSnapshot.get)
    val warmUs = (System.nanoTime() - tWarm0) / 1e3
    require(resolved.valuesIterator.flatten.size === buckets + commits * touched)

    println(s"""{"metric":"manifest_metadata","buckets":$buckets,"commits":$commits,""" +
      s""""touchedPerCommit":$touched,"deltaBytes":$deltaBytes,"fullBytes":$fullBytes,""" +
      s""""reduction":${"%.1f".format(fullBytes.toDouble / deltaBytes)},""" +
      s""""commitMsTotal":${"%.0f".format(commitMs)},""" +
      s""""coldResolveMs":${"%.1f".format(coldMs)},"warmResolveUs":$warmUs}""")
    // sweep
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(Paths.get(dir))
  }

  private implicit class ReqEq[A](private val a: A) extends AnyVal {
    def ===(b: A): Boolean = a == b
  }
}
