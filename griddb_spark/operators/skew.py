"""Skew mitigation: salted equi-join.

AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`, on by
default in `session.get_spark`) handles most skew; explicit salting is the
deterministic fallback for pathologically hot keys — e.g. a device id that
produces 10% of a 100 TB events table, where one reducer would otherwise
receive the whole key.

Shape: the skewed (large) side gets a salt bucket derived from a stable
row hash; the small side is replicated ``salt`` times; the join key becomes
(key, salt). Same result set as the plain join, with the hot key spread
over ``salt`` reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted across ``salt`` sub-keys.

    ``skewed`` rows get a deterministic bucket (hash of all columns, so
    retries recompute identically); ``small`` rows are exploded ×``salt``.
    Supports inner/left joins (the replicated side must be the preserved
    side's lookup table).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replicate the small side)")
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted.join(replicated, on=[*keys, _SALT], how=how).drop(_SALT)
