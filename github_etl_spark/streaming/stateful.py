"""Custom stateful streaming operator via `applyInPandasWithState`.

Demonstrates the escape hatch for semantics the built-in stateful
operators can't express (SURVEY.md §2.10): arbitrary per-key state with
Arrow-batched (not row-at-a-time) Python. The operator here is a
running per-key counter with last-seen timestamp — the skeleton any
custom accumulating state (fraud scores, CDC merge, rate trackers)
drops into.

Scale notes: state lives in the state store keyed by the groupBy key
(one shuffle to co-locate); Arrow moves each group's batch in columnar
form. Use built-ins (`dropDuplicatesWithinWatermark`, windowed aggs)
whenever they fit — this path exists for when they don't.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, batch_events bigint, total_events bigint"
STATE_SCHEMA = "total bigint"


IDLE_EVICT_MS = 6 * 3600 * 1000  # drop state for keys idle this long


def _update_running_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # Idle key: evict its counter so state stays bounded by ACTIVE
        # keys, not every key ever seen (an unbounded key space would
        # otherwise grow the state store and checkpoints forever).
        state.remove()
        return
    (total,) = state.get if state.exists else (0,)
    batch_n = sum(len(pdf) for pdf in pdf_iter)
    total = (total or 0) + batch_n
    state.update((total,))
    state.setTimeoutDuration(IDLE_EVICT_MS)
    yield pd.DataFrame(
        {"user_id": [key[0]], "batch_events": [batch_n], "total_events": [total]}
    )


def running_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key cumulative event counts across micro-batches.

    Emits one row per key per micro-batch in which the key appears:
    (key, events this batch, events ever). State = one long per key,
    evicted after six idle hours (a key that reappears later restarts
    from zero — the documented trade for bounded state; keep totals
    exact forever only if the key space itself is bounded).
    """
    return events.groupBy(key).applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
