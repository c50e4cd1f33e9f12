package graft.plans

/** Plan contracts shared between PlanAuditSpec (which ASSERTS them
  * against the plans) and Bench (which reports against them).
  *
  * Why this lives in main sources: the driver keeps only the tail of
  * bench stdout, and the whitelisted partition-less windows below each
  * log Spark's "No Partition Defined for Window operation" warning
  * there on every run. A reader of `BENCH_r{N}.json` could not tell a
  * NEW warning (a regression: some query lost its partition spec)
  * from the known ones without re-deriving the whitelist from the test
  * sources — so Bench counts the warnings per query (log4j appender on
  * the WindowExec logger) and emits the nonzero counts BY QUERY NAME
  * on the same JSON line (`pw`), with this whitelist alongside in the
  * full bench_out.json (`pw_whitelist`). A `pw` key outside the
  * whitelist is mechanically a regression.
  */
object PlanContracts {

  /** Queries allowed partition-less windows — a single-task sort,
    * acceptable only on provably dimension-sized inputs, whitelisted
    * with justification:
    */
  val globalWindowWhitelist: Set[String] = Set(
    // the documented single-partition rung; the fact-scale cutover is
    // q_window_ntile_approx
    "q_window_ntile",
    // global relevance rank over a one-row-per-part aggregate
    // (dimension-sized; reference Search.scala:600-605)
    "q_search_index_cascade",
    // rank over the k-row (k=5) findSynonyms output — model-sized
    "q_embedding_synonyms"
  )
}
