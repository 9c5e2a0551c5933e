"""The single definition of the 30-minute sessionization inactivity gap.

Three operators sessionize the events stream — batch gaps-and-islands
(`operators/relational.py::events_sessionize`), the built-in
`session_window` twin (`operators/relational_ext.py::events_session_window`
plus its streaming twin in `streaming/events.py`), and the hand-kept
state-store sessionizer (`streaming/stateful.py`).  All three use THIS
gap; import it rather than re-typing 1800.

Deliberate convention difference — do NOT "unify" the comparisons:

* `events_sessionize` splits on ``date_diff('second', …) > 1800`` —
  SECOND-BOUNDARY CROSSINGS (epoch-seconds truncation on both engines).
  That is the classic SQL gaps-and-islands contract and is pinned by its
  oracle.
* `events_session_window` (and the streaming twins) must match Spark's
  `session_window` operator, which merges iff the REAL-TIME gap is
  strictly < 30 min — so its oracle compares ``epoch_us(…) >=
  SESSION_GAP_US`` exactly.  A 1799.3 s gap that crosses 1800
  second-boundaries splits under the first rule but merges under the
  second; both behaviors are correct for their operator (witness
  documented at the oracle in relational_ext.py).
"""

from __future__ import annotations

SESSION_GAP_SECONDS = 1800
SESSION_GAP_US = SESSION_GAP_SECONDS * 1_000_000
# Interval string for F.session_window / streaming watermark-side twins.
SESSION_GAP_INTERVAL = "30 minutes"
