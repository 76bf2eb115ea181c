package graft.tools

import graft.operators.{Multimodal, MultimodalFixtures}

/** Dev probe: decode every fixture class locally and print the resulting
  * metadata rows — used to pin the exact error-channel strings in the
  * catalog oracle and specs. */
object MultimodalProbe {
  def main(args: Array[String]): Unit = {
    // dump mode: write one real container per fixture class into a
    // directory (used once to create src/test/resources/media/)
    if (args.nonEmpty) {
      val dir = java.nio.file.Paths.get(args(0))
      java.nio.file.Files.createDirectories(dir)
      def put(name: String, bytes: Array[Byte]): Unit =
        java.nio.file.Files.write(dir.resolve(name), bytes)
      put("pattern_0.png", MultimodalFixtures.patternPng(0))
      put("solid_1.jpg", MultimodalFixtures.solidJpeg(1))
      put("anim_2.gif", MultimodalFixtures.animatedGif(2))
      put("tone_3.wav", MultimodalFixtures.wavBytes(3))
      put("truncated_5.png", MultimodalFixtures.truncatedPng(5))
      println(s"fixtures written to $dir")
      return
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    val rows = (0L until 12L).map(MultimodalFixtures.decodeRow)
    Multimodal.decode(rows.toDS()).collect().sortBy(_.media_id).foreach { d =>
      println(s"id=${d.media_id} mime=${d.mime} bytes=${d.byte_len} -> w=${d.width} " +
        s"h=${d.height} frames=${d.n_frames} sr=${d.sample_rate} ch=${d.channels} " +
        s"ok=${d.decode_ok} err=${d.error}")
    }
    // pipeline stage probe: resize + features on one pattern png
    val one = Seq(MultimodalFixtures.pipelineRow(0L)).toDS()
    val rz = Multimodal.resize(one, 64, 64).collect().head
    println(s"resize ok=${rz.resize_ok} len=${rz.resized_bytes.length}")
    val ft = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(0L, "image/png", rz.resized_bytes)).toDS(), 16)
      .collect().head
    println(s"features ok=${ft.feature_ok} emb=${ft.embedding.mkString(",")}")
    spark.stop()
  }
}
