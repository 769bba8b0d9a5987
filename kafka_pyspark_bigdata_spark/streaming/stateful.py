"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for per-key streaming logic Spark's built-in windows can't
express (SURVEY.md §2: the reference's only stateful op is the count
batcher; this adds the general-purpose API the north star asks for).

The demonstration operator keeps per-user running totals (event count +
exact value sum) across micro-batches in a GroupState and emits the updated
totals every batch. Design points that make it correct at scale:

- State is keyed by user_id → Spark shuffles each micro-batch once on the
  key and partitions the state store the same way; state size is O(users).
- Batches arrive as an Arrow-backed pandas iterator (no row-at-a-time
  Python), and the per-key pass is linear.
- The sum is kept as integer cents (floor(value*100 + 0.5)) so it is
  exact and ORDER-INDEPENDENT — the emitted totals do not depend on how
  the bounded replay was split into micro-batches, which is what lets a
  SQL oracle check the final state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_cents", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), True),
        StructField("sum_cents", LongType(), True),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_events, sum_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_events += len(pdf)
        sum_cents += int(
            np.floor(pdf["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5)
            .astype(np.int64)
            .sum()
        )
    state.update((n_events, sum_cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_events], "sum_cents": [sum_cents]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents sum) over a stream of
    (user_id, value) rows, emitted after every micro-batch update."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
