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


# ---------------------------------------------------------------------------
# Streaming heavy hitters: sharded Misra-Gries state across micro-batches
# ---------------------------------------------------------------------------

MG_OUTPUT_SCHEMA = "shard int, tok string, lower long, dsum long, nrows long"
MG_STATE_SCHEMA = (
    "toks array<string>, counts array<long>, dsum long, nrows long"
)


def _mg_update_fn(counters: int):
    def update(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            toks, counts, dsum, nrows = state.get
            mg = dict(zip(toks or [], counts or []))
            dsum, nrows = dsum or 0, nrows or 0
        else:
            mg, dsum, nrows = {}, 0, 0
        for pdf in pdf_iter:
            vals = pdf["tok"].dropna()
            nrows += len(vals)
            for item, c in vals.value_counts().items():
                mg[item] = mg.get(item, 0) + int(c)
            excess = len(mg) - counters
            if excess > 0:
                d = sorted(mg.values())[excess - 1]
                dsum += d
                mg = {t: v - d for t, v in mg.items() if v > d}
        state.update((list(mg.keys()), list(mg.values()), dsum, nrows))
        state.setTimeoutDuration(IDLE_EVICT_MS)
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(mg),
                "tok": list(mg.keys()),
                "lower": list(mg.values()),
                "dsum": [dsum] * len(mg),
                "nrows": [nrows] * len(mg),
            }
        )

    return update


def streaming_heavy_hitters(
    tokens: DataFrame,
    col: str = "tok",
    counters: int = 64,
    shards: int = 8,
) -> DataFrame:
    """Heavy-hitter tracking over an unbounded token stream: tokens are
    consistently hashed onto ``shards`` independent Misra-Gries states
    (one shuffle to co-locate a shard's tokens; each shard's state is
    ≤ ``counters`` entries regardless of vocabulary), and every
    micro-batch emits each updated shard's current summary with its
    certified error terms.

    The emitted rows ARE `operators/sketches.py` summary fragments:
    downstream folds them with ``mg_merge``/``mg_estimate`` for global
    bounds (a token's true stream count t satisfies
    lower_shard ≤ t ≤ lower_shard + dsum_shard — consistent hashing
    sends all its occurrences to one shard, so per-shard MG semantics
    are exact for it). State is bounded by shards × counters entries;
    idle shards evict after six hours like `running_totals`.
    """
    import pyspark.sql.functions as F

    keyed = tokens.select(
        F.pmod(F.xxhash64(F.col(col)), F.lit(shards)).cast("int").alias("shard"),
        F.col(col).cast("string").alias("tok"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_update_fn(counters),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
