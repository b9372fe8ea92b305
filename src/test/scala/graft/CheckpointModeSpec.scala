package graft

import org.apache.spark.sql.functions._
import graft.core.Checkpoints

/** End-to-end proof that the Reliable (filesystem) checkpoint mode is a
  * drop-in for Local on the iterative operators: identical results, with
  * real checkpoint files written under the configured dir. On a cluster
  * Reliable is what survives executor loss; this spec pins the switch
  * actually works before anyone needs it mid-incident.
  */
class CheckpointModeSpec extends SparkSuite {
  import spark.implicits._

  private def withCheckpointDir[T](f: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    spark.sparkContext.setCheckpointDir(s"file://$dir")
    try f
    finally {
      // leave sc usable for other suites; files are /tmp-scoped
      val fs = new java.io.File(dir.toString)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(fs)
    }
  }

  test("Components.labels: Reliable mode equals Local bit-for-bit") {
    // two chains + an isolate — multi-round propagation before convergence
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val verts = (1L to 12L).toDF("id")
    // driverCutoff = 0 forces the iterative path — the checkpoint modes
    // only exist there (the r9 small-graph fast path never checkpoints)
    val local = graft.operators.Components
      .labels(verts, "id", edges, "a", "b", ckpt = Checkpoints.Local,
        driverCutoff = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = withCheckpointDir {
      graft.operators.Components
        .labels(verts, "id", edges, "a", "b", ckpt = Checkpoints.Reliable,
          driverCutoff = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(reliable == local)
    assert(local.filter(_._2 == 1L).map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("Bpe.train: driver-local, Local and Reliable distributed loops " +
      "produce the identical merge sequence") {
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
      .limit(80).select(col("text"))
    val driverLocal = graft.functions.Bpe.train(docs, "text", numMerges = 4)
    val local = graft.functions.Bpe.trainDistributed(docs, "text",
      numMerges = 4, ckpt = Checkpoints.Local)
    val reliable = withCheckpointDir {
      graft.functions.Bpe.trainDistributed(docs, "text", numMerges = 4,
        ckpt = Checkpoints.Reliable)
    }
    assert(local == driverLocal)
    assert(reliable == driverLocal)
    assert(driverLocal.size == 4)
  }
}
