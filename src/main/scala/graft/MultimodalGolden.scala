package graft

/** Golden oracle for `x_multimodal_pipeline`.
  *
  * The pipeline runs REAL JDK codecs over planted media
  * (`operators/MultimodalFixtures.scala`): `javax.imageio` PNG encode →
  * decode → exact nearest-neighbor resample → pixel-read grid-luminance
  * embedding for images, `javax.sound.sampled` PCM decode → time-windowed
  * energy embedding for WAVs, then the exact-integer `bruteForceTopKExact`
  * ANN over the union. Because every planted pixel AND every planted PCM
  * sample is a pure formula of `media_id` and both container paths are
  * lossless, the expected output is a computable constant derived
  * INDEPENDENTLY of the engine (and of any image/audio library) by
  * `tools/golden_multimodal.py` — a numpy replay of the pixel, sample,
  * resample, feature and ANN laws. A hash match therefore proves the JDK
  * codec paths reproduced the planted media exactly, end to end.
  * Regenerate with `python3 tools/golden_multimodal.py` if a fixture or
  * codec law changes. */
object MultimodalGolden {
  val pipelineOracleSql: String =
    """SELECT * FROM (VALUES
      |  (0::BIGINT, 30::BIGINT, 1::INT, 95944690::BIGINT, 99995559::BIGINT),
      |  (0::BIGINT, 15::BIGINT, 2::INT, 94657950::BIGINT, 99998169::BIGINT),
      |  (0::BIGINT, 17::BIGINT, 3::INT, 94553871::BIGINT, 99992634::BIGINT),
      |  (1::BIGINT, 35::BIGINT, 1::INT, 97781374::BIGINT, 99992706::BIGINT),
      |  (1::BIGINT, 27::BIGINT, 2::INT, 97493014::BIGINT, 99994892::BIGINT),
      |  (1::BIGINT, 31::BIGINT, 3::INT, 97220739::BIGINT, 99998342::BIGINT),
      |  (2::BIGINT, 6::BIGINT, 1::INT, 98962977::BIGINT, 99995929::BIGINT),
      |  (2::BIGINT, 36::BIGINT, 2::INT, 98770556::BIGINT, 99998425::BIGINT),
      |  (2::BIGINT, 26::BIGINT, 3::INT, 98561013::BIGINT, 99990904::BIGINT),
      |  (3::BIGINT, 20::BIGINT, 1::INT, 79116470::BIGINT, 99999770::BIGINT),
      |  (3::BIGINT, 7::BIGINT, 2::INT, 78354198::BIGINT, 99995197::BIGINT),
      |  (3::BIGINT, 8::BIGINT, 3::INT, 78222926::BIGINT, 100001990::BIGINT),
      |  (5::BIGINT, 27::BIGINT, 1::INT, 98103803::BIGINT, 99994892::BIGINT),
      |  (5::BIGINT, 16::BIGINT, 2::INT, 97495018::BIGINT, 100009231::BIGINT),
      |  (5::BIGINT, 31::BIGINT, 3::INT, 97119167::BIGINT, 99998342::BIGINT),
      |  (6::BIGINT, 32::BIGINT, 1::INT, 99139524::BIGINT, 100002010::BIGINT),
      |  (6::BIGINT, 17::BIGINT, 2::INT, 98994908::BIGINT, 99992634::BIGINT),
      |  (6::BIGINT, 2::BIGINT, 3::INT, 98962977::BIGINT, 100002519::BIGINT)
      |) AS t(query_id, neighbor_id, rank, dot, n2)
      |ORDER BY query_id, rank""".stripMargin

  /** Golden for `x_multimodal_pipeline_v2` — the three-modality union
    * (image resize-grid, GIF-as-video frame-sampled grid, WAV energy)
    * under the same exact laws, replayed independently by
    * `tools/golden_multimodal_v2.py`. Regenerate with
    * `python3 tools/golden_multimodal_v2.py` if a fixture law changes. */
  val pipelineV2OracleSql: String =
    """SELECT * FROM (VALUES
      |(0::BIGINT, 30::BIGINT, 1::INT, 95944690::BIGINT, 99995559::BIGINT),
      |(0::BIGINT, 2::BIGINT, 2::INT, 94881811::BIGINT, 100003381::BIGINT),
      |(0::BIGINT, 26::BIGINT, 3::INT, 94855699::BIGINT, 99995750::BIGINT),
      |(1::BIGINT, 8::BIGINT, 1::INT, 97492544::BIGINT, 99998198::BIGINT),
      |(1::BIGINT, 26::BIGINT, 2::INT, 97484727::BIGINT, 99995750::BIGINT),
      |(1::BIGINT, 38::BIGINT, 3::INT, 97483870::BIGINT, 100009143::BIGINT),
      |(2::BIGINT, 14::BIGINT, 1::INT, 99999496::BIGINT, 100001533::BIGINT),
      |(2::BIGINT, 26::BIGINT, 2::INT, 99996190::BIGINT, 99995750::BIGINT),
      |(2::BIGINT, 38::BIGINT, 3::INT, 99998669::BIGINT, 100009143::BIGINT),
      |(3::BIGINT, 7::BIGINT, 1::INT, 78354198::BIGINT, 99995197::BIGINT),
      |(3::BIGINT, 6::BIGINT, 2::INT, 78015215::BIGINT, 99995929::BIGINT),
      |(3::BIGINT, 36::BIGINT, 3::INT, 77577096::BIGINT, 99998425::BIGINT),
      |(6::BIGINT, 14::BIGINT, 1::INT, 99255802::BIGINT, 100001533::BIGINT),
      |(6::BIGINT, 38::BIGINT, 2::INT, 99247692::BIGINT, 100009143::BIGINT),
      |(6::BIGINT, 26::BIGINT, 3::INT, 99238050::BIGINT, 99995750::BIGINT),
      |(7::BIGINT, 8::BIGINT, 1::INT, 97856079::BIGINT, 99998198::BIGINT),
      |(7::BIGINT, 2::BIGINT, 2::INT, 97824270::BIGINT, 100003381::BIGINT),
      |(7::BIGINT, 26::BIGINT, 3::INT, 97795924::BIGINT, 99995750::BIGINT)
      |) AS t(query_id, neighbor_id, rank, dot, n2)
      |ORDER BY query_id, rank""".stripMargin
}
