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


def test_float_boundary_rescale_tolerated():
    # r13 driver counterexample (hypothesis): totals 414 -> 446,
    # 207 * (446/414) = 222.99999999999997 in float, so the old form saw
    # |224 - 222.999...| = 1.0000000000000284 > 1.0 and flagged an exact
    # proportional rescale. Exact integer arithmetic tolerates it:
    # |224*414 - 207*446| = 414 <= 414.
    base = {"aggregates": 207, "shuffle_exchanges": 207}
    cur = {"aggregates": 224, "shuffle_exchanges": 222}
    assert sum(base.values()) == 414 and sum(cur.values()) == 446
    assert loop_tolerated(base, cur)


def test_error_entries_never_tolerated():
    assert not loop_tolerated(BASE, {"error": "boom"})
    assert not loop_tolerated({"error": "boom"}, BASE)
    assert not loop_tolerated({"error": "boom"}, {"error": "boom"})


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _SIG = st.fixed_dictionaries(
        {
            "aggregates": st.integers(0, 500),
            "arrow_kernels": st.just(0),
            "broadcast_exchanges": st.integers(0, 300),
            "broadcast_hash_joins": st.integers(0, 300),
            "nested_loop_joins": st.just(0),
            "python_per_row": st.just(0),
            "shuffle_exchanges": st.integers(1, 600),
            "sort_merge_joins": st.integers(0, 50),
            "sorts": st.integers(0, 200),
        }
    )

    @given(base=_SIG, scale_pct=st.integers(90, 110))
    @settings(max_examples=200, deadline=None, derandomize=True)
    def test_fuzz_uniform_rescale_tolerated(base, scale_pct):
        cur = {
            k: (round(v * scale_pct / 100) if v else 0) for k, v in base.items()
        }
        # exact proportional rescale of every nonzero field: tolerated
        # whenever the rounding error stays within the ±1 contract
        # (tiny bases can round past it — then flagging is CORRECT, so
        # only assert the acceptance direction on clean rescales).
        # Guard mirrors loop_tolerated's exact-integer form so a float
        # order-of-operations boundary can't split the two (r13 ADVICE).
        total_b, total_c = sum(base.values()), sum(cur.values())
        if all(abs(cur[k] * total_b - base[k] * total_c) <= total_b
               for k in base if base[k]):
            assert loop_tolerated(base, cur)

    @given(base=_SIG, bump=st.integers(5, 50))
    @settings(max_examples=200, deadline=None, derandomize=True)
    def test_fuzz_single_field_shape_change_flagged(base, bump):
        # a LARGE change to one field with everything else fixed is a
        # shape change, not a rescale — must flag (guard: only when the
        # bump is big enough that the induced global scale can't absorb
        # it within ±1 on some other nonzero field)
        cur = dict(base)
        cur["sort_merge_joins"] = base["sort_merge_joins"] + bump
        others = [k for k in base if base[k] and k != "sort_merge_joins"]
        if not others:
            return
        # exact-integer guard mirroring loop_tolerated's contract (the
        # old float form could split from it right at the boundary)
        total_b, total_c = sum(base.values()), sum(cur.values())
        if all(abs(cur[k] * total_b - base[k] * total_c) <= total_b
               for k in base if base[k]):
            return  # tiny vectors where the rescale legally absorbs it
        assert not loop_tolerated(base, cur)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_loop_entry_set_matches_contraction_family():
    assert LOOP_ENTRIES == {
        "dedup_components_delta",
        "dedup_components_drop",
        "dedup_components_mixed",
    }
