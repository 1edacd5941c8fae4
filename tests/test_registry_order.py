"""Gate for the driver-sampling contract (round-2 verdict item #1).

The external driver oracle-checks only the FIRST 50 keys of
``queries()``.  Round 2 lost driver-side correctness rows for the
whole SURVEY §2 core because insertion order front-loaded 17 join
variants and 27 text long-tail keys.  registry.PRIORITY_ORDER now
pins the window; these tests make sure nobody un-pins it by accident
(a new module import, a renamed key, a dropped oracle).
"""

from __future__ import annotations

from morphl_model_user_search_intent_spark import oracle_sql, queries
from morphl_model_user_search_intent_spark.registry import (
    PRIORITY_ORDER,
    REGISTRY,
)

DRIVER_WINDOW = 50


def test_priority_order_fills_the_driver_window():
    assert len(PRIORITY_ORDER) == DRIVER_WINDOW
    assert len(set(PRIORITY_ORDER)) == DRIVER_WINDOW, "duplicate key"


def test_first_50_keys_are_exactly_priority_order():
    assert list(queries())[:DRIVER_WINDOW] == list(PRIORITY_ORDER)


def test_every_window_key_is_oracle_checked():
    """A rows-only key inside the window wastes a driver correctness
    slot — every windowed key must carry a full DuckDB oracle."""
    oracles = oracle_sql()
    missing = [k for k in PRIORITY_ORDER if k not in oracles]
    assert not missing, f"window keys without oracle: {missing}"


def test_window_covers_every_survey2_family():
    """One representative per SURVEY §2 family must sit in the window
    (prefix match on the family's key stem)."""
    stems = [
        "q_agg_", "q_win_", "q_sort_", "q_set_", "q_dedup_",
        "q_str_funcs", "q_date_funcs", "q_math_funcs", "q_array_funcs",
        "q_map_funcs", "q_json_funcs", "q_stream_", "q_sessionize",
        "q_sim_", "q_multimodal", "q_udf_", "q_source_", "q_sink_",
        "q_scan_", "q_project", "q_filter_", "q_case_when", "q_join_",
        "q_text_",
    ]
    window = list(PRIORITY_ORDER)
    uncovered = [
        s for s in stems if not any(k.startswith(s) for k in window)
    ]
    assert not uncovered, f"§2 families missing from window: {uncovered}"


def test_registry_intact_behind_the_window():
    """Reordering must never drop or duplicate registered queries."""
    ks = list(queries())
    assert len(ks) == len(set(ks)) == len(REGISTRY)
    assert set(ks) == set(REGISTRY)
