"""Unit tests for the plan-census diff rules (probes/plan_census.py):
the loop-entry uniform-rescale tolerance and the error-entry handling
(r12 ADVICE + VERDICT item 4) — pure functions, no Spark."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "probes"))

from plan_census import LOOP_ENTRIES, loop_tolerated  # noqa: E402

BASE = {
    "aggregates": 310,
    "arrow_kernels": 0,
    "broadcast_exchanges": 177,
    "broadcast_hash_joins": 177,
    "nested_loop_joins": 0,
    "python_per_row": 0,
    "shuffle_exchanges": 415,
    "sort_merge_joins": 12,
    "sorts": 128,
}


def _scaled(scale):
    return {k: (round(v * scale) if v else 0) for k, v in BASE.items()}


def test_identical_is_tolerated():
    assert loop_tolerated(BASE, dict(BASE))


def test_uniform_rescale_is_tolerated():
    # the observed r12 wobble shape: ~one extra contraction pass,
    # every nonzero field up proportionally
    assert loop_tolerated(BASE, _scaled(415 / 412))
    assert loop_tolerated(BASE, _scaled(1.02))
    assert loop_tolerated(_scaled(1.02), BASE)  # symmetric direction


def test_shape_change_is_flagged():
    # a broadcast degrading to sort-merge changes the field MIX
    cur = dict(BASE)
    cur["broadcast_hash_joins"] -= 10
    cur["broadcast_exchanges"] -= 10
    cur["sort_merge_joins"] += 10
    cur["shuffle_exchanges"] += 20
    assert not loop_tolerated(BASE, cur)


def test_zero_fields_stay_exact():
    for field in ("python_per_row", "nested_loop_joins", "arrow_kernels"):
        cur = _scaled(1.01)
        cur[field] = 1
        assert not loop_tolerated(BASE, cur), field


def test_error_entries_never_tolerated():
    assert not loop_tolerated(BASE, {"error": "boom"})
    assert not loop_tolerated({"error": "boom"}, BASE)
    assert not loop_tolerated({"error": "boom"}, {"error": "boom"})


def test_loop_entry_set_matches_contraction_family():
    assert LOOP_ENTRIES == {
        "dedup_components_delta",
        "dedup_components_drop",
        "dedup_components_mixed",
    }
