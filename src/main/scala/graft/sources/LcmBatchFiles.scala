package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{StellarXdr, XdrEncode}
import graft.model.LedgerModel.LedgerRow

/** The reference's DATASTORE file layout as a Spark input format: zstd-framed
  * `LedgerCloseMetaBatch` XDR objects, one ledger per file, 64 000 files per
  * partition prefix (`/root/reference/internal/utils/main.go:972-1019`; the
  * naming scheme is the public stellar-go `datastore` package's
  * `GetObjectKeyFromSequenceNumber` — hex-INVERTED zero-padded prefixes so
  * lexicographic listing descends by sequence and object names spread evenly
  * across bucket index ranges).
  *
  * Read side: `spark.read.format("binaryFile")` over the tree (partition
  * pruning by pushed path filters), then ONE executor-side flatMap at the
  * deserialization boundary — decompress, decode, emit LedgerRows. Map-only:
  * a 100 TB backfill parallelizes per file exactly like the reference's
  * BufferedStorageBackend workers.
  */
object LcmBatchFiles {

  val LedgersPerFile = 1L
  val FilesPerPartition = 64000L

  /** The datastore object key for a ledger sequence (public naming law). */
  def objectKey(seq: Long, ledgersPerFile: Long = LedgersPerFile,
      filesPerPartition: Long = FilesPerPartition): String = {
    val partitionSize = ledgersPerFile * filesPerPartition
    val fileStart = (seq / ledgersPerFile) * ledgersPerFile
    val fileEnd = fileStart + ledgersPerFile - 1
    val partitionStart = (seq / partitionSize) * partitionSize
    val partitionEnd = partitionStart + partitionSize - 1
    val partitionPrefix =
      f"${0xffffffffL - partitionStart}%08x--$partitionStart-$partitionEnd"
    val fileName =
      if (ledgersPerFile == 1) f"${0xffffffffL - fileStart}%08x--$fileStart"
      else f"${0xffffffffL - fileStart}%08x--$fileStart-$fileEnd"
    s"$partitionPrefix/$fileName.xdr.zstd"
  }

  /** Write one batch object (zstd-framed LedgerCloseMetaBatch). The object
    * key is derived from the schema's `ledgersPerFile`, so a multi-ledger
    * batch gets the `start-end` file-name form the naming law prescribes. */
  def writeObject(root: Path, startSeq: Long, endSeq: Long,
      lcms: Seq[Array[Byte]],
      ledgersPerFile: Long = LedgersPerFile,
      filesPerPartition: Long = FilesPerPartition): Path = {
    val rel = objectKey(startSeq, ledgersPerFile, filesPerPartition)
    val target = root.resolve(rel)
    Files.createDirectories(target.getParent)
    val out = new ZstdOutputStream(
      new BufferedOutputStream(new FileOutputStream(target.toFile)))
    try out.write(XdrEncode.ledgerCloseMetaBatch(startSeq, endSeq, lcms))
    finally out.close()
    target
  }

  /** Generate a batch-file tree from encoded (header, txs) ledgers —
    * the test/ingest-staging writer (1 ledger per file, like the
    * reference's exporter). */
  def writeTree(rootDir: String,
      ledgers: Seq[(Array[Byte], Seq[XdrEncode.LcmTx])],
      networkId: Array[Byte]): Unit = {
    val root = Paths.get(rootDir)
    ledgers.foreach { case (header, txs) =>
      val row = StellarXdr.decodeLedgerHeader(header)
      val lcm = XdrEncode.ledgerCloseMetaV1(header, txs,
        networkId = networkId)
      writeObject(root, row.ledgerSeq, row.ledgerSeq, Seq(lcm))
    }
  }

  def writeTree(rootDir: String,
      ledgers: Seq[(Array[Byte], Seq[XdrEncode.LcmTx])]): Unit =
    writeTree(rootDir, ledgers, StellarXdr.PublicNetworkId)

  /** Multi-ledger-batch tree writer: ledgers grouped into fixed
    * `ledgersPerFile` spans, one object per span (the datastore schema's
    * `ledgers_per_file > 1` configuration). */
  def writeTree(rootDir: String,
      ledgers: Seq[(Array[Byte], Seq[XdrEncode.LcmTx])],
      ledgersPerFile: Long): Unit = {
    val root = Paths.get(rootDir)
    ledgers.map { case (header, txs) =>
      val seq = StellarXdr.decodeLedgerHeader(header).ledgerSeq
      (seq, XdrEncode.ledgerCloseMetaV1(header, txs))
    }.groupBy { case (seq, _) => Math.floorDiv(seq, ledgersPerFile) }
      .foreach { case (_, grp) =>
        val sorted = grp.sortBy(_._1)
        writeObject(root, sorted.head._1, sorted.last._1,
          sorted.map(_._2), ledgersPerFile)
      }
  }

  private def decompress(bytes: Array[Byte]): Array[Byte] = {
    val in = new ZstdInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Decode one object's bytes (executor-side). `networkId` selects the
    * passphrase domain-separating the tx hashes (the reference's
    * `--testnet`/`--futurenet` flags, `internal/utils/main.go:866-895`). */
  def decodeObject(bytes: Array[Byte],
      networkId: Array[Byte] = StellarXdr.PublicNetworkId): Seq[LedgerRow] =
    StellarXdr.decodeLedgerCloseMetaBatch(decompress(bytes), networkId)

  /** The backfill read path: binaryFile scan → executor decode. Column
    * pruning drops `content` siblings; only `.xdr.zstd` objects match. */
  def ledgerRows(spark: SparkSession, rootDir: String,
      networkId: Array[Byte] = StellarXdr.PublicNetworkId): Dataset[LedgerRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xdr.zstd")
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(decodeObject(_, networkId))
  }

  /** Permissive-mode result: one row per OBJECT file — either its decoded
    * ledgers or the error (poison objects must be reported, never dropped;
    * the caller splits on `error`, mirroring
    * [[graft.operators.RealXdrSource.ledgerRowsPermissive]]). */
  final case class ObjectDecodeResult(path: String, rows: Seq[LedgerRow],
      error: Option[String])

  def objectsPermissive(spark: SparkSession, rootDir: String,
      networkId: Array[Byte] = StellarXdr.PublicNetworkId): Dataset[ObjectDecodeResult] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xdr.zstd")
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        try ObjectDecodeResult(path, decodeObject(bytes, networkId), None)
        catch {
          case e: Exception => ObjectDecodeResult(path, Nil,
            Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
  }

  /** Range-pruned variant: the object-key law maps a ledger range to its
    * file names, so the scan lists ONLY the matching objects instead of the
    * whole tree — the 100 TB shape (a backfill of 1M ledgers out of 200M
    * touches 1M objects, not the full listing). The path list is built on
    * the driver (one stat per candidate object — microseconds each); a
    * full-history job at the hundreds-of-millions-of-ledgers grain should
    * chunk its range into per-job slices anyway, exactly as the
    * reference's batch loop does. */
  def ledgerRowsForRange(spark: SparkSession, rootDir: String,
      startSeq: Long, endSeq: Long,
      networkId: Array[Byte] = StellarXdr.PublicNetworkId): Dataset[LedgerRow] = {
    import spark.implicits._
    val paths = (startSeq to endSeq by LedgersPerFile)
      .map(seq => s"$rootDir/${objectKey(seq)}")
      .filter(p => Files.exists(Paths.get(p)))
    if (paths.isEmpty) spark.emptyDataset[LedgerRow]
    else spark.read.format("binaryFile")
      .load(paths: _*)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(decodeObject(_, networkId))
      .filter(r => r.sequence >= startSeq && r.sequence <= endSeq)
  }

  /** Object→ledger decode over the DSv2 connector's object grain — shared
    * by batch reads and micro-batch `foreachBatch` bodies. */
  def ledgerRowsFromObjects(objects: DataFrame,
      networkId: Array[Byte] = StellarXdr.PublicNetworkId): Dataset[LedgerRow] = {
    val spark = objects.sparkSession; import spark.implicits._
    objects.select(col("content")).as[Array[Byte]]
      .flatMap(decodeObject(_, networkId))
  }

  /** The connector form of the backfill read: pushed sequence bounds prune
    * partition prefixes and objects BY NAME at the scan (visible as
    * PushedFilters in the plan), then the usual executor-side decode.
    *
    * The object-level predicate is range OVERLAP (not containment), so a
    * multi-ledger object straddling a bound still contributes its in-range
    * ledgers; the row-level filter trims the overhang. Identical plan and
    * rows for the 1-ledger-per-file schema. `options` passes the datastore
    * schema config (`ledgersPerFile`, `filesPerPartition`) through. */
  def ledgerRowsViaConnector(spark: SparkSession, rootDir: String,
      startSeq: Long, endSeq: Long,
      options: Map[String, String] = Map.empty): Dataset[LedgerRow] =
    ledgerRowsFromObjects(
      spark.read.format("graft-lcm-datastore").options(options).load(rootDir)
        .where(col("end_sequence") >= startSeq &&
          col("start_sequence") <= endSeq))
      .filter(r => r.sequence >= startSeq && r.sequence <= endSeq)

  /** Tail a LIVE datastore tree: micro-batch stream at the object grain
    * (probe-based advance, no per-trigger listing) → executor decode.
    * `startSeq` is a LEDGER bound: with a multi-ledger schema the object
    * straddling it still streams (overlap pushdown) and the overhang is
    * trimmed row-level. */
  def ledgerRowsStream(spark: SparkSession, rootDir: String,
      startSeq: Option[Long] = None,
      options: Map[String, String] = Map.empty): Dataset[LedgerRow] = {
    val objects = spark.readStream.format("graft-lcm-datastore")
      .options(options).load(rootDir)
    val rows = ledgerRowsFromObjects(
      startSeq.map(s => objects.where(col("end_sequence") >= s))
        .getOrElse(objects))
    startSeq.map(s => rows.filter(_.sequence >= s)).getOrElse(rows)
  }
}
