package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, Executors}
import org.apache.hadoop.fs.Path
import graft.sources.CommitProtocol

/** The commit primitive under genuine contention: exactly one publisher
  * wins, the committed bytes are the winner's forever, and the losers'
  * temps never leak. This is what every manifest/marker protocol above
  * it inherits — on LOCAL filesystems the decider is link(2), because
  * POSIX rename silently replaces an existing file (the lost-update
  * this spec would catch).
  */
class CommitProtocolSpec extends SparkSpec {

  private def hfs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("contended publishFile: one winner, immutable bytes, no leaked temps") {
    (0 until 5).foreach { round =>
      val dir = new Path(Files.createTempDirectory(s"cp$round").toString)
      val fs = hfs(dir)
      val dest = new Path(dir, "manifest-00000001.json")
      val pool = Executors.newFixedThreadPool(4)
      try {
        val tasks = (0 until 4).map(i => new Callable[Boolean] {
          def call(): Boolean = CommitProtocol.publishFile(fs, dest,
            s"writer-$i".getBytes("UTF-8"))
        })
        val results = pool.invokeAll(java.util.Arrays.asList(tasks: _*))
        val winners = (0 until 4).filter(i => results.get(i).get())
        assert(winners.size == 1, s"round $round: winners were $winners")
        // committed bytes are EXACTLY the winner's — a silent replace by
        // a "successful" loser is the lost-update failure mode
        assert(CommitProtocol.readFully(fs, dest) == s"writer-${winners.head}")
        // and a later publisher observes the taken slot
        assert(!CommitProtocol.publishFile(fs, dest, "late".getBytes("UTF-8")))
        assert(CommitProtocol.readFully(fs, dest) == s"writer-${winners.head}")
        // no temp leaks (checksum sidecars aside, nothing dot-prefixed)
        val leaks = fs.listStatus(dir).map(_.getPath.getName)
          .filter(n => n.startsWith("." + dest.getName) && n.endsWith(".tmp"))
        assert(leaks.isEmpty, s"round $round leaked: ${leaks.mkString(", ")}")
      } finally pool.shutdown()
    }
  }
}
