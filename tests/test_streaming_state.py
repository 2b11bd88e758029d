"""State-cost contract of the streaming dedup kernel: per-trigger state
I/O must stay flat in stream history.  With the marker-per-content-hash
design this is structural — an already-seen key performs NO state write
and a new key writes one constant-size marker — asserted here directly on
``dedup_first_fn`` with a fake GroupState."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simdcomp_spark.streaming import dedup_first_fn  # noqa: E402


class FakeState:
    def __init__(self, exists: bool):
        self.exists = exists
        self.updates: list[tuple] = []

    def update(self, v):
        self.updates.append(v)


def _run(state, rows):
    return list(dedup_first_fn(("h",), iter(rows), state))


def test_new_key_writes_one_constant_marker():
    st = FakeState(exists=False)
    out = _run(st, [pd.DataFrame({"doc_id": ["b", "a"],
                                  "text": ["t", "t"]})])
    assert len(st.updates) == 1
    assert st.updates[0] == (True,)          # one boolean, not a blob
    assert out[0]["doc_id"].tolist() == ["a"]


def test_seen_key_is_read_only_regardless_of_history():
    # a key seen in ANY earlier trigger: no state write, no emit — so
    # per-trigger state I/O is O(new keys in the trigger), flat in history
    for _ in range(3):
        st = FakeState(exists=True)
        out = _run(st, [pd.DataFrame({"doc_id": ["z"], "text": ["t"]})])
        assert st.updates == []
        assert len(out[0]) == 0


def test_min_doc_across_multiple_chunks():
    st = FakeState(exists=False)
    out = _run(st, [pd.DataFrame({"doc_id": ["m"], "text": ["t"]}),
                    pd.DataFrame({"doc_id": ["c", "x"],
                                  "text": ["t", "t"]})])
    assert out[0]["doc_id"].tolist() == ["c"]
    assert len(st.updates) == 1
