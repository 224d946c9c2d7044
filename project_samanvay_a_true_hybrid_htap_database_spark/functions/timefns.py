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
    """Whole seconds since the naive epoch. Input must be TIMESTAMP_NTZ.
    Matches DuckDB's epoch_us // 1e6 for post-epoch timestamps only:
    timestamp_diff truncates toward zero while DuckDB's // floors, so the
    two diverge for pre-1970 values (none in any testdata generation; if
    pre-epoch data ever appears, switch to an explicit floor)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("SECOND", _epoch_ntz(), c)


def epoch_seconds_ltz(col: Column | str) -> Column:
    """Whole seconds since the epoch for a TIMESTAMP (LTZ) column. An LTZ
    value is an absolute instant, so its epoch is session-tz-independent by
    construction (unix_micros reads the internal UTC microseconds). This is
    the streaming twin of ``epoch_seconds``: Structured Streaming refuses
    watermarks on TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so
    stream event-time columns stay LTZ and must use THIS helper — applying
    the NTZ ``epoch_seconds`` to an LTZ column coerces through the session
    timezone and shifts the result (ADVICE r5)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_seconds(c)


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
