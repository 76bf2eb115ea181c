package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S7/S10 — the history-archive backend re-expressed over Spark: the
  * reference walks a remote archive sequentially, one checkpoint object at
  * a time (`internal/input/ledgers_history_archive.go:10-35`); here the
  * archive LAYOUT and checkpoint path math are first-class and the read is
  * one Spark task per checkpoint file over any Hadoop-visible root (local
  * dir, s3a://, gs://) — the HTTP fetch is just a filesystem in Spark's
  * model, so a 1000-executor cluster pulls 1000 checkpoints concurrently
  * instead of looping on a driver.
  *
  * Path math follows the public stellar-archivist layout: checkpoints
  * close at sequence ≡ 63 (mod 64) (`utils/main.go:808-827`: remainder =
  * (seq+1) % 64, checkpoint = seq + 64 - remainder), and a category file
  * lives at `{cat}/{aa}/{bb}/{cc}/{cat}-{aabbccdd}.xdr.gz` where
  * `aabbccdd` is the checkpoint sequence in 8-hex.
  *
  * File payloads here are gzipped streams of length-prefixed
  * [[graft.codec.Lcm]] XDR frames (the environment ships no real archive
  * corpus); the decode path is the same subset codec the `.lcmb` DSv2
  * source parses. */
object HistoryArchive {

  val CheckpointFrequency = 64

  /** The checkpoint ledger containing `seq` (`GetCheckpointNum`). */
  def checkpointOf(seq: Long): Long = {
    val r = (seq + 1) % CheckpointFrequency
    if (r == 0) seq else seq + CheckpointFrequency - r
  }

  /** `{cat}/aa/bb/cc/{cat}-aabbccdd.xdr.gz` for one checkpoint. */
  def categoryPath(category: String, checkpoint: Long): String = {
    val hex = f"$checkpoint%08x"
    s"$category/${hex.substring(0, 2)}/${hex.substring(2, 4)}/" +
      s"${hex.substring(4, 6)}/$category-$hex.xdr.gz"
  }

  /** Every checkpoint whose 64-ledger window intersects [start, end]. */
  def checkpointsFor(start: Long, end: Long): Seq[Long] =
    checkpointOf(start) to checkpointOf(end) by CheckpointFrequency

  /** Full op view: the wire carries `nOps ×` operations per envelope
    * (empty for a zero-op transaction, which the wire format permits). */
  case class ArchiveOp(op_type: Int, amount: Long)
  case class ArchiveTx(fee_charged: Long, successful: Boolean,
      operations: Seq[ArchiveOp])
  case class ArchiveLedger(sequence: Long, closed_at: Timestamp,
      transactions: Seq[ArchiveTx])

  /** Write a fixture archive under `root` using the StellarFixture laws
    * (same formulas as `LcmWriter.writeFixture`), one gzipped frame-stream
    * file per checkpoint, full layout directories included. */
  def writeFixture(root: String, start: Long, end: Long): Seq[String] =
    checkpointsFor(start, end).map { cp =>
      val f = new java.io.File(root, categoryPath("ledger", cp))
      f.getParentFile.mkdirs()
      val out = new java.io.DataOutputStream(new java.util.zip.GZIPOutputStream(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))))
      val lo = cp - CheckpointFrequency + 1
      (math.max(lo, 1L) to cp).foreach { seq =>
        // header-carrying V1 frames, same laws as the batch-file fixture —
        // the archive read path decodes any version arm
        val frame = graft.codec.Lcm.encode(LcmWriter.fixtureFrame(seq))
        out.writeInt(frame.length)
        out.write(frame)
      }
      out.close()
      f.getAbsolutePath
    }

  /** Open one checkpoint object. A LIVE archive is plain HTTP(S) — the
    * reference's backend walks `https://history.stellar.org/.../{cat}/…`
    * one GET per checkpoint (`internal/input/ledgers_history_archive.go:
    * 10-35` via the SDK's historyarchive client) — so `http(s)://` roots
    * stream through a direct URL connection (each Spark task fetches its
    * own checkpoint: the 1000-executor cluster issues 1000 concurrent
    * GETs); every other scheme (file:, hdfs:, s3a:, gs:) resolves through
    * the Hadoop FileSystem for the shipped conf. */
  private def openCheckpoint(path: String,
      conf: org.apache.hadoop.conf.Configuration): java.io.InputStream =
    if (path.startsWith("http://") || path.startsWith("https://")) {
      val conn = java.net.URI.create(path).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(120000)
      val code = conn.getResponseCode
      require(code == 200, s"archive GET $path returned HTTP $code")
      conn.getInputStream
    } else {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(conf).open(p)
    }

  /** Read ledgers [start, end] from an archive root: the checkpoint file
    * list is pure path math (no listing round-trips), distributed one task
    * per checkpoint; each task streams its gzip, decodes frame headers, and
    * fully decodes only in-range frames. */
  def read(spark: SparkSession, root: String, start: Long, end: Long): Dataset[ArchiveLedger] = {
    import spark.implicits._
    val paths = checkpointsFor(start, end)
      .map(cp => s"$root/${categoryPath("ledger", cp)}")
    // ship the driver's Hadoop conf so tasks resolve any FS scheme the
    // cluster knows (file:, hdfs:, s3a:, gs:) — a raw FileInputStream
    // would silently narrow this source to local paths
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.createDataset(paths)
      .repartition(paths.size) // one checkpoint per task
      .mapPartitions { it =>
        it.flatMap { path =>
          val in = new java.io.DataInputStream(new java.util.zip.GZIPInputStream(
            new java.io.BufferedInputStream(
              openCheckpoint(path, conf.value), 1 << 16)))
          Iterator.continually {
            try {
              val len = in.readInt()
              val payload = new Array[Byte](len)
              in.readFully(payload)
              Some(payload)
            } catch { case _: java.io.EOFException => in.close(); None }
          }.takeWhile(_.isDefined).flatten.flatMap { payload =>
            val buf = java.nio.ByteBuffer.wrap(payload)
            val (seq, closeMs) = graft.codec.Lcm.decodeHeader(buf)
            if (seq >= start && seq <= end) {
              val txs = graft.codec.Lcm.decodeTxs(buf).map { t =>
                ArchiveTx(t.feeCharged, t.successful,
                  t.ops.map(o => ArchiveOp(o.opType, o.amountStroops)))
              }
              Some(ArchiveLedger(seq, new Timestamp(closeMs), txs))
            } else None
          }
        }
      }
  }
}
