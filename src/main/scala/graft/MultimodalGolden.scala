package graft

/** Golden oracle for `x_multimodal_pipeline`.
  *
  * Every codec stage in the pipeline is the documented deterministic stub
  * law (fnv64a decode gate, sha-256-seeded resize payload, sha-256-chain
  * embeddings — `operators/Multimodal.scala`) and the ANN ranking is the
  * exact-integer `bruteForceTopKExact` key, so the expected output is a
  * computable constant. These rows were derived INDEPENDENTLY of the
  * engine by `tools/golden_multimodal.py` (python hashlib/numpy replay of
  * the laws); regenerate with `python3 tools/golden_multimodal.py` if the
  * fixture or a stub law changes.
  */
object MultimodalGolden {
  val pipelineOracleSql: String =
    """SELECT * FROM (VALUES
      |  (0::BIGINT, 7::BIGINT, 1::INT, 44325958::BIGINT, 100010840::BIGINT),
      |  (0::BIGINT, 36::BIGINT, 2::INT, 31335505::BIGINT, 99995847::BIGINT),
      |  (0::BIGINT, 16::BIGINT, 3::INT, 27636164::BIGINT, 100005051::BIGINT),
      |  (1::BIGINT, 19::BIGINT, 1::INT, 64549665::BIGINT, 99985713::BIGINT),
      |  (1::BIGINT, 21::BIGINT, 2::INT, 55965491::BIGINT, 99994572::BIGINT),
      |  (1::BIGINT, 17::BIGINT, 3::INT, 52729054::BIGINT, 99992610::BIGINT),
      |  (2::BIGINT, 7::BIGINT, 1::INT, 42912617::BIGINT, 100010840::BIGINT),
      |  (2::BIGINT, 11::BIGINT, 2::INT, 36465438::BIGINT, 99998609::BIGINT),
      |  (2::BIGINT, 38::BIGINT, 3::INT, 32369266::BIGINT, 100001864::BIGINT),
      |  (3::BIGINT, 15::BIGINT, 1::INT, 35136230::BIGINT, 100003093::BIGINT),
      |  (3::BIGINT, 29::BIGINT, 2::INT, 27174572::BIGINT, 100004331::BIGINT),
      |  (3::BIGINT, 0::BIGINT, 3::INT, 25904440::BIGINT, 99993539::BIGINT),
      |  (4::BIGINT, 35::BIGINT, 1::INT, 54821663::BIGINT, 100010740::BIGINT),
      |  (4::BIGINT, 9::BIGINT, 2::INT, 33191776::BIGINT, 99997698::BIGINT),
      |  (4::BIGINT, 13::BIGINT, 3::INT, 25165846::BIGINT, 100006631::BIGINT)
      |) AS t(query_id, neighbor_id, rank, dot, n2)
      |ORDER BY query_id, rank""".stripMargin
}
