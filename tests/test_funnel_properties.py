"""Property tests for the streaming funnel's state fold (no JVM).

`_update_funnel` is the per-user fold `applyInPandasWithState` runs; the
property pins that folding ANY batch-split of a time-ordered event
sequence lands on exactly the batch definition's anchors:
vt = first view; ct = first click strictly after vt; pt = first purchase
strictly after ct — regardless of how the sequence is cut into
micro-batches (the delivery shape a real trigger produces varies run to
run, so only the split-invariance property makes the parity test at
sf0.001 trustworthy beyond its one split).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from event_store_spark.streaming.funnel import _update_funnel


class _FakeState:
    """Duck-typed GroupState: exists/get/update — all the fold touches."""

    def __init__(self):
        self._value = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def _reference(events):
    """Batch semantics from first principles over the full ordered log."""
    events = sorted(events)
    vt = next((t for t, e in events if e == "view"), None)
    ct = (
        next((t for t, e in events if e == "click" and t > vt), None)
        if vt is not None
        else None
    )
    pt = (
        next((t for t, e in events if e == "purchase" and t > ct), None)
        if ct is not None
        else None
    )
    return vt, ct, pt


def _fold(events, cuts):
    """Run the stateful fold over the given batch split."""
    state = _FakeState()
    last = None
    bounds = [0] + sorted(cuts) + [len(events)]
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = events[lo:hi]
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([t * 1000 for t, _ in chunk], unit="us"),
                "event_id": range(lo, hi),
                "event_type": [e for _, e in chunk],
                "user_id": [1] * len(chunk),
            }
        )
        [last] = list(_update_funnel((1,), iter([pdf]), state))
    return state._value, last


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=0,
    max_size=25,
)


@given(
    events=events_strategy,
    cuts=st.lists(st.integers(min_value=0, max_value=25), max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_fold_matches_batch_semantics_under_any_split(events, cuts):
    # ordered delivery contract: sort by (ts) with the original index as
    # the event_id tiebreak, like the store's replay order
    events = sorted(events)
    cuts = [c for c in cuts if c <= len(events)]
    (vt, ct, pt), last = _fold(events, cuts)
    evt = _reference(events)
    as_us = tuple(v * 1000 if v is not None else None for v in evt)
    assert (vt, ct, pt) == as_us
    stage = 0 if vt is None else (1 if ct is None else (2 if pt is None else 3))
    assert int(last["stage"].iloc[0]) == stage


@given(events=events_strategy)
@settings(max_examples=100, deadline=None)
def test_fold_is_idempotent_on_empty_batches(events):
    """Empty trailing micro-batches must not move the state."""
    events = sorted(events)
    state_once, _ = _fold(events, [])
    state = _FakeState()
    state._value = state_once
    [out] = list(_update_funnel((1,), iter([pd.DataFrame(
        {"ts": pd.to_datetime([], unit="us"), "event_id": [],
         "event_type": [], "user_id": []}
    )]), state))
    assert state._value == state_once
