"""Custom stateful streaming operator (SURVEY.md §2.9 note on T6:
`applyInPandasWithState` is the engine-native escape hatch for state
machines Spark's built-in windows can't express).

``running_totals_with_state`` keeps one state row per key — count and
value sum so far — and emits the updated running totals every
micro-batch. The state store bounds memory to O(distinct keys).

Idle-key eviction note: ``GroupStateTimeout.ProcessingTimeTimeout``
would cap state at 100 TB-scale key cardinality, but re-arming a
timeout every batch makes ``Trigger.AvailableNow`` runs loop on empty
timeout-driven micro-batches instead of draining (observed: 76 batches
for one input file). A continuously-triggered production deployment
should re-enable the timeout; bounded drain-style runs must not.

The reference's closest analogue is the period-transition state machine
(etl_sync.py:504-566), which stays a batch job here (T6); this operator
exists for true streaming state the batch path can't cover.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals_with_state(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, sum) maintained in the state
    store across micro-batches. Input needs ``event_type`` and
    ``value`` columns; works only on a streaming DataFrame."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# successor API: typed state variables (ValueState here; ListState /
# MapState / timers / TTL also exist) managed per key by the engine,
# so state schema evolution and eviction policy live with the store,
# not hand-rolled in the update function. Kept alongside the
# applyInPandasWithState form above as the migration path.
# ---------------------------------------------------------------------------
try:
    # the TWS driver worker needs protobuf at RUNTIME (state-server
    # protocol); this container ships PySpark 4 without it, so gate on
    # both — the operator is exercised wherever protobuf exists.
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    def running_totals_tws(events: DataFrame) -> DataFrame:
        """`running_totals_with_state` on the transformWithState API —
        identical semantics, engine-managed typed state. Deployment
        requires the RocksDB state store provider
        (spark.sql.streaming.stateStore.providerClass) — the only
        provider TWS supports — and protobuf in the Python env."""
        return events.groupBy("event_type").transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=RUNNING_TOTAL_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - pre-4.0 PySpark / no protobuf
    running_totals_tws = None  # type: ignore[assignment]
