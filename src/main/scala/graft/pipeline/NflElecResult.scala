package graft.pipeline

import java.sql.Date

/** Typed row of the flagship pipeline's 25-column golden output — the
  * `Dataset[T]` API edge SURVEY §1 calls for (field order and types match
  * the reference's committed artifact, FIXTURES.md §A: date32 → Date,
  * int32 → Int, int64 → Long, bool → Boolean).
  *
  * `DataFrame` stays the pipeline's internal currency (Catalyst optimizes
  * untyped columns best); the typed view is the consumer-facing boundary
  * where compile-time field access matters.
  */
case class NflElecResult(
    elec_date: Date,
    pres_winning_party: String,
    pres_winning_candidate: String,
    count_electoral_votes: Long,
    count_popular_votes: Long,
    pop_winning_candidate: String,
    pop_winning_party: String,
    electoral_rank_desc: Int,
    popular_rank_desc: Int,
    challenger_pres_party: String,
    incumbent_pres_party: String,
    pop_incumbent_party: String,
    pop_incumbent_elec_result: String,
    game_date: Date,
    team: String,
    final_score: Int,
    home_team_rnk: Int,
    winning_team: String,
    winning_team_score: Int,
    redskins_result: String,
    date_diff: Long,
    diff_rank_asc: Int,
    p_elec_date: Date,
    prediction: String,
    prediction_results: Boolean)
