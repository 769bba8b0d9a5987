"""Join utilities for skewed keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime,
but it only helps sort-merge joins AFTER a shuffle materializes the skew.
``salted_join`` is the planning-time alternative for the pathological case
— a handful of keys holding a double-digit percentage of a 100 TB fact
table: the big side spreads each key over N salt buckets (derived from a
row-local hash, no rand(), so retries/speculative tasks stay consistent),
the small side is replicated N× via a literal explode, and the equi-join
runs on (key, salt). Each reducer then sees at most 1/N of any hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key load spread
    over ``salts`` reducers. ``small`` is replicated ``salts``× (keep it
    the dimension side). Output columns match ``big.join(small, key, how)``
    for inner/left/semi/anti joins; right/full outer are rejected — an
    unmatched small-side row exists once per salt replica, so outer-side
    preservation would duplicate it."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}"
        )
    big_salted = big.withColumn(
        _SALT,
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salts)).cast("int"),
    )
    small_salted = small.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )
    return big_salted.join(small_salted, [key, _SALT], how).drop(_SALT)
