"""Type-agnostic event-time arithmetic.

The engine's time-gap operators (bounce detection, gap sessionization,
interval joins) are parameterized on a caller-supplied ``ts_col`` that may
arrive as:

- ``timestamp`` (LTZ) — e.g. built via ``to_timestamp`` / ``timestamp_micros``,
- ``timestamp_ntz`` — what Spark 4's parquet reader infers for
  ``timestamp[us]`` columns with no UTC-adjustment flag
  (``spark.sql.parquet.inferTimestampNTZ.enabled`` default), which is how
  the driver-generated ``events.parquet`` reads today,
- a numeric epoch-seconds column (test fixtures, pre-derived doubles).

``TIMESTAMP_NTZ`` cannot be cast to ``double`` directly (Spark raises
DATATYPE_MISMATCH), so every gap computation goes through
:func:`epoch_seconds`, which first normalizes NTZ -> LTZ. The session pins
``spark.sql.session.timeZone=UTC`` (session.py), making that cast a pure
reinterpretation — no DST folds, bit-exact micros — and identical to the
DuckDB oracle's ``epoch(ts)``.

Exactness: timestamp->double is epoch seconds with the fractional part;
for epoch ~2^31 plus microseconds the scaled integer fits a 53-bit double
mantissa, so comparisons at micro precision are exact. A ``long`` cast
would truncate micros and mis-order events that straddle whole-second gap
boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, col_name: str) -> Column:
    """Epoch-seconds double for a timestamp/timestamp_ntz/numeric column.

    Branches on the *resolved* dtype of ``col_name`` in ``df`` — a plan-time
    decision, zero runtime cost. Derived columns of the same type (e.g. a
    ``lead()`` of the column) should use :func:`epoch_seconds_col` with the
    dtype already in hand.
    """
    return epoch_seconds_col(F.col(col_name), dict(df.dtypes).get(col_name))


def epoch_seconds_col(col: Column, dtype: str | None) -> Column:
    """Same as :func:`epoch_seconds` for an arbitrary Column expression
    whose source dtype the caller already resolved."""
    if dtype is not None and dtype.startswith("timestamp"):
        # NTZ -> LTZ first (UTC session tz: exact reinterpretation), then
        # LTZ -> double (epoch seconds, micros in the fraction). The first
        # cast is a no-op for LTZ input.
        return col.cast("timestamp").cast("double")
    return col.cast("double")
