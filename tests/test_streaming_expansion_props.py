"""Property tests for the round-6 primitives: the streaming two-Generate
pair expansion (must equal the one-Generate shape and the itertools ground
truth on arbitrary member arrays) and the bench wait-for-idle gate's decay
logic (pure-function test with injected load readings — no real sleeping).
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=7),
        max_size=5,
    )
)
def test_streaming_expansion_matches_itertools(spark, groups):
    """For arbitrary (deduplicated, sorted) member arrays, both expansion
    shapes emit exactly the i<j combinations of each group."""
    from fpl_data_pipeline_spark.operators.dedup import (
        _expand_member_pairs,
        _expand_member_pairs_streaming,
    )
    canon = [sorted(set(g)) for g in groups]
    df = spark.createDataFrame(
        [(g,) for g in canon] or [([],)], "members array<long>"
    )
    expected = sorted(
        pair for g in canon for pair in itertools.combinations(g, 2)
    )
    one = sorted((r.a, r.b) for r in _expand_member_pairs(df).collect())
    two = sorted((r.a, r.b) for r in _expand_member_pairs_streaming(df).collect())
    assert one == expected
    assert two == expected


def test_wait_for_idle_decay(monkeypatch):
    """The gate sleeps while EITHER average is hot and returns the number
    of waits taken; it exits immediately on a quiet box and gives up at
    the deadline on a permanently busy one."""
    import bench

    # quiet box: no waits
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 1.0, 1.0))
    assert bench._wait_for_idle(2.0, 600) == 0

    # draining box: 1-min quiet but 5-min hot -> waits until 5-min decays
    readings = iter([(1.0, 6.0, 6.0), (1.0, 4.0, 5.0), (1.0, 3.0, 4.0)])
    state = {"now": 0.0}
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(readings))
    monkeypatch.setattr(bench.time, "monotonic", lambda: state["now"])
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: state.__setitem__("now", state["now"] + s)
    )
    assert bench._wait_for_idle(2.0, 600) == 2  # exits at 5-min 3.0 <= 3.5

    # permanently busy: bounded by the deadline, never hangs
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.0, 9.0, 9.0))
    state["now"] = 0.0
    assert bench._wait_for_idle(2.0, 120) == 4  # 4 x 30 s, then deadline
