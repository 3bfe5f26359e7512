"""Oracle parity for the 44 declared queries (SURVEY.md §2) at BOTH
smoke SFs (sf0.001 and the driver's sf0.01).

Mirrors the driver's correctness gate: Spark result vs DuckDB oracle,
order-insensitive value compare after dtype normalization.
"""

from __future__ import annotations

import pytest

from _replay import prefetch_replays
from swivel_spark_prep_spark.queries.declared import (
    DECLARED_ORACLES,
    DECLARED_QUERIES,
)

# SURVEY.md §2.4 expected sf0.001 row counts — harness self-check.
EXPECTED_ROWS_SF0001 = {
    "Q01_scan_project": 5, "Q02_filter_pred": 193, "Q03_filter_in_between_like": 5,
    "Q04_case_coalesce": 1500, "Q05_join_inner_multi": 25, "Q06_join_left": 150,
    "Q07_join_semi": 93, "Q08_join_anti": 57, "Q09_join_full_outer": 150,
    "Q10_join_cross": 125, "Q11_join_range_theta": 150, "Q12_join_asof": 202,
    "Q13_agg_tpch_q1": 6, "Q14_agg_distinct": 3, "Q15_agg_rollup": 31,
    "Q16_agg_cube_having": 12, "Q17_agg_stats": 5, "Q18_win_rank": 150,
    "Q19_win_laglead": 1000, "Q20_win_frame_running": 1500,
    "Q21_win_topk_per_group": 75, "Q22_sort_limit": 10, "Q23_union": 25,
    "Q24_intersect": 10, "Q25_except": 3, "Q26_string_funcs": 150,
    "Q27_date_funcs": 1500, "Q28_math_funcs": 6000, "Q29_array_explode": 245,
    "Q30_array_funcs": 500, "Q31_json_funcs": 1000, "Q32_vocab_count": 31,
    "Q33_vocab_ids": 31, "Q34_cooc_window": 913, "Q35_shard_marginals": 16,
    "Q36_tumbling_window": 868, "Q37_sliding_window": 1065,
    "Q38_session_window": 15, "Q39_exact_dedup": 1, "Q40_dedup_survivors": 500,
    "Q41_jaccard_pairs": 28, "Q42_cosine_topk": 5, "Q43_text_stats": 5,
    "Q44_udf_normalize": 1000,
}


@pytest.fixture(scope="session")
def declared_replay(spark, each_sf):
    """Threaded prefetch of all declared replays (tests/_replay.py),
    including the SURVEY §2.4 oracle row-count self-check."""

    def survey_check(name, oracle_pdf):
        expected = (
            EXPECTED_ROWS_SF0001.get(name)
            if each_sf.rstrip("/").endswith("sf0.001")
            else None
        )
        if expected is not None and len(oracle_pdf) != expected:
            return [
                f"oracle self-check failed: got {len(oracle_pdf)} rows, "
                f"SURVEY.md §2.4 says {expected} — harness bug, not engine bug"
            ]
        return []

    return prefetch_replays(
        spark, each_sf, DECLARED_QUERIES, DECLARED_ORACLES,
        extra_check=survey_check,
    )


@pytest.mark.parametrize("name", sorted(DECLARED_QUERIES))
def test_declared_query_matches_oracle(name, declared_replay):
    problems = declared_replay[name]
    assert not problems, f"{name}: " + "; ".join(problems)
