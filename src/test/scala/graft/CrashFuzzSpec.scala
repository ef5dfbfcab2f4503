package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest
import graft.operators.Upsert

/** Single-writer randomized CRASH fuzz over every commit verb, run on the
  * HDFS-semantics [[FaultyFileSystem]]: each step arms [[FaultGate]] to
  * kill the k-th mutating IO operation (k random) and every one after it —
  * a process crash at an arbitrary point, cleanup included — then
  * adjudicates the observed table state against the single-commit-point
  * contract:
  *
  *  - a crashed verb leaves the table readable as EITHER its pre-state or
  *    its post-state — never a torn mix, never an error;
  *  - maintenance verbs (compaction, vacuum) crashed at any point leave
  *    the CONTENT bit-identical (their post-state IS the pre-state);
  *  - a crashed idempotent append re-run cleanly lands EXACTLY once,
  *    whichever side of the commit point the crash fell on;
  *  - the distributed pruned read (checkpoint twins + tail edits) agrees
  *    with the adjudicated model across crash debris;
  *  - a periodic clean vacuum over the debris (orphaned staging, doomed
  *    twins, mid-swap sidecars — completed by recovery) never changes
  *    content, and the history keeps accepting verbs afterwards.
  *
  * Complements [[MultiWriterFuzzSpec]] (races, no faults) with the other
  * axis (faults, no races). Short checkpoint cadence + a twin floor of 1
  * keep the table twin-anchored, so the churn-bounded edits commit path,
  * streamed boundary publishes, and twin writes all crash mid-flight too.
  * Because the scheme's rename fails on existing destinations (the HDFS
  * contract), this fuzz also exercises the commit protocol's non-link(2)
  * publish branch and `overwriteFile`'s delete-then-rename fallback, which
  * no `file://` suite can reach.
  */
class CrashFuzzSpec extends SparkSpec {
  import spark.implicits._

  private type Model = Map[Long, Long]

  private sealed trait Verb {
    def run(root: String): Unit
    def apply(m: Model): Model
    /** post-crash clean re-run must land exactly once (txn header) */
    def idempotentRetry: Boolean = false
  }

  private case class CowDelete(lo: Long, hi: Long) extends Verb {
    def run(root: String): Unit = {
      SnapshotManifest.deleteWhere(spark, root, col("id").between(lo, hi),
        Seq("id")); ()
    }
    def apply(m: Model): Model = m.filterNot { case (k, _) => k >= lo && k <= hi }
  }
  private case class MorDelete(lo: Long, hi: Long) extends Verb {
    def run(root: String): Unit = {
      SnapshotManifest.deleteWhereMoR(spark, root, col("id").between(lo, hi)); ()
    }
    def apply(m: Model): Model = m.filterNot { case (k, _) => k >= lo && k <= hi }
  }
  private case class CowUpdate(lo: Long, hi: Long, d: Long) extends Verb {
    def run(root: String): Unit = {
      SnapshotManifest.updateWhere(spark, root, col("id").between(lo, hi),
        Map("v" -> (col("v") + d)), Seq("id")); ()
    }
    def apply(m: Model): Model =
      m.map { case (k, v) => k -> (if (k >= lo && k <= hi) v + d else v) }
  }
  private case class MorUpdate(lo: Long, hi: Long, d: Long) extends Verb {
    def run(root: String): Unit = {
      SnapshotManifest.updateWhereMoR(spark, root, col("id").between(lo, hi),
        Map("v" -> (col("v") + d)), Seq("id")); ()
    }
    def apply(m: Model): Model =
      m.map { case (k, v) => k -> (if (k >= lo && k <= hi) v + d else v) }
  }
  private case class CowMerge(rows: Seq[(Long, Long)]) extends Verb {
    def run(root: String): Unit = {
      Upsert.mergeWhere(spark, root, rows.toDF("id", "v"), Seq("id"),
        Seq("id")); ()
    }
    def apply(m: Model): Model = m ++ rows
  }
  private case class MorMerge(rows: Seq[(Long, Long)]) extends Verb {
    def run(root: String): Unit = {
      Upsert.mergeWhereMoR(spark, root, rows.toDF("id", "v"), Seq("id"),
        Seq("id")); ()
    }
    def apply(m: Model): Model = m ++ rows
  }
  private case class AppendIdem(rows: Seq[(Long, Long)], appId: String)
      extends Verb {
    def run(root: String): Unit = {
      SnapshotManifest.appendRowsIdempotent(spark, root,
        rows.toDF("id", "v").repartition(1), appId, txnVersion = 1L,
        Seq("id"), maxAttempts = 1); ()
    }
    def apply(m: Model): Model = m ++ rows // fresh keys by construction
    override def idempotentRetry: Boolean = true
  }
  private case object Compact extends Verb {
    def run(root: String): Unit = { SnapshotManifest.compactSnapshot(spark, root); () }
    def apply(m: Model): Model = m
  }
  private case object CompactSmall extends Verb {
    def run(root: String): Unit = { SnapshotManifest.compactSmallFiles(spark, root); () }
    def apply(m: Model): Model = m
  }
  private case object VacuumVerb extends Verb {
    // serial single-writer: keep=3/minAge=0 is in-contract
    def run(root: String): Unit = { SnapshotManifest.vacuum(spark, root, keep = 3); () }
    def apply(m: Model): Model = m
  }

  private def genVerb(rnd: scala.util.Random, freshKey: () => Long): Verb = {
    def range(): (Long, Long) = {
      val lo = rnd.nextLong(141); (lo, lo + rnd.nextLong(13))
    }
    def kv(n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((rnd.nextLong(151), rnd.nextLong(199) - 99))
        .distinctBy(_._1)
    rnd.nextInt(20) match {
      case 0 | 1 | 2      => val (l, h) = range(); CowDelete(l, h)
      case 3 | 4 | 5      => val (l, h) = range(); MorDelete(l, h)
      case 6 | 7          => val (l, h) = range(); CowUpdate(l, h, 1L + rnd.nextLong(9))
      case 8 | 9          => val (l, h) = range(); MorUpdate(l, h, 1L + rnd.nextLong(9))
      case 10 | 11 | 12   => CowMerge(kv(3))
      case 13 | 14 | 15   => MorMerge(kv(3))
      case 16 | 17 =>
        val k = freshKey()
        AppendIdem(Seq((k, k), (freshKey(), -k)), s"crashfuzz-$k")
      case 18             => if (rnd.nextBoolean()) Compact else CompactSmall
      case _              => VacuumVerb
    }
  }

  private def readState(root: String): Model =
    SnapshotManifest.read(spark, root).as[(Long, Long)].collect().toMap

  test("crash fuzz: an injected IO failure at ANY point in ANY verb leaves pre-or-post state, idempotent appends land exactly once across the crash, and the history continues") {
    val dir = java.nio.file.Files.createTempDirectory("crashfuzz").toString
    val root = s"faulty://$dir/t"
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
    val steps = 150
    try {
      FaultGate.disarm()
      spark.conf.set("graft.manifest.checkpointInterval", "4")
      spark.conf.set("graft.manifest.parquetCheckpointMinLines", "1")
      SnapshotManifest.commit(spark, root,
        (0L until 60L).map(i => (i, i * 10L)).toDF("id", "v").repartition(2),
        Seq("id"))
      var model: Model = (0L until 60L).map(i => i -> i * 10L).toMap
      val rnd = new scala.util.Random(20260816L)
      val keyCounter = new java.util.concurrent.atomic.AtomicLong(1000L)
      var crashes = 0
      var cleanLandings = 0
      (0 until steps).foreach { step =>
        val verb = genVerb(rnd, () => keyCounter.getAndIncrement())
        FaultGate.arm(1L + rnd.nextInt(70))
        val failure =
          try { verb.run(root); FaultGate.disarm(); None }
          catch {
            case scala.util.control.NonFatal(t) =>
              val injected = FaultGate.tripped
              FaultGate.disarm()
              assert(injected,
                s"step $step: $verb failed WITHOUT an injected fault — $t")
              Some(t)
          }
        failure match {
          case None =>
            model = verb.apply(model)
            cleanLandings += 1
          case Some(_) =>
            crashes += 1
            val observed = readState(root)
            val post = verb.apply(model)
            assert(observed == model || observed == post,
              s"step $step: crashed $verb (at ${FaultGate.trippedAt}) left a " +
                s"state that is NEITHER pre nor post — vs pre: ${
                  ((observed.toSet diff model.toSet) ++
                    (model.toSet diff observed.toSet)).take(8)
                }; vs post: ${
                  ((observed.toSet diff post.toSet) ++
                    (post.toSet diff observed.toSet)).take(8)
                }")
            if (verb.idempotentRetry) {
              verb.run(root) // clean retry straddling the crashed commit
              model = post
              val after = readState(root)
              assert(after == model,
                s"step $step: idempotent retry after crash did not land " +
                  s"exactly once — ${
                    ((after.toSet diff model.toSet) ++
                      (model.toSet diff after.toSet)).take(8)
                  }")
            } else model = observed
        }
        if (step % 20 == 19) {
          val pruned = SnapshotManifest
            .readWhere(spark, root, col("id") >= Long.MinValue)
            .as[(Long, Long)].collect().toMap
          assert(pruned == model,
            s"step $step: readWhere through the checkpoint frame diverged " +
              s"from the adjudicated model — ${
                ((pruned.toSet diff model.toSet) ++
                  (model.toSet diff pruned.toSet)).take(8)
              }")
        }
        if (step % 40 == 39) {
          // clean reclamation over the crash debris: orphaned staging,
          // doomed twins, recovered swaps — content must not move
          SnapshotManifest.vacuum(spark, root, keep = 2)
          val after = readState(root)
          assert(after == model,
            s"step $step: clean vacuum over crash debris changed content")
        }
      }
      // the fuzz must be a fuzz: both outcomes well-represented
      assert(crashes >= steps / 6, s"degenerate run: only $crashes crashes in $steps steps")
      assert(cleanLandings >= steps / 6, s"degenerate run: only $cleanLandings clean landings in $steps steps")
    } finally {
      FaultGate.disarm()
      spark.conf.unset("graft.manifest.checkpointInterval")
      spark.conf.unset("graft.manifest.parquetCheckpointMinLines")
    }
  }
}
