"""Timezone-independent epoch helpers for TIMESTAMP_NTZ columns.

events.ts is TIMESTAMP_NTZ (naive wall-clock — current testdata generation;
sources.load_table normalizes every generation to NTZ). ``unix_timestamp()``
on an NTZ column is interpreted in the *session* timezone, so its value
would silently change under a non-UTC driver session while the DuckDB
oracle computes naive-as-UTC epochs (``epoch_us(ts) // 1_000_000``).
``timestamp_diff`` against the NTZ epoch literal is pure calendar
arithmetic — the same number in every session timezone. The reference
stores timestamps as int64 millis with no timezone notion at all
(StorageEngine/include/columnar_format.hpp:26), so naive-as-UTC is also
the semantics-faithful reading.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _epoch_ntz() -> Column:
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since the naive epoch (truncating, like DuckDB's
    epoch_us // 1e6). Input must be TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("SECOND", _epoch_ntz(), c)


def epoch_days(col: Column | str) -> Column:
    """Whole days since the naive epoch (truncating)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("DAY", _epoch_ntz(), c)


def hour_epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds of the naive hour truncation — replaces
    epoch_seconds(date_trunc('hour', ts)): date_trunc casts NTZ to
    session-timezone TIMESTAMP, which only looks correct in timezones whose
    1970 and query-date UTC offsets happen to match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("HOUR", _epoch_ntz(), c) * 3600


def trunc_hour_ntz(col: Column | str) -> Column:
    """Naive hour truncation that stays TIMESTAMP_NTZ (date_trunc coerces
    NTZ to session-tz TIMESTAMP; round-tripping back breaks for wall-clock
    times that don't exist in the session timezone)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add(
        "HOUR", F.timestamp_diff("HOUR", _epoch_ntz(), c), _epoch_ntz()
    )
