"""Date/duration scalar functions (SURVEY.md §2.C).

The reference formats run-metric timestamps as French ``dd/MM/yyyy
HH:mm:ss`` and wall-clock durations as zero-padded ``HH:MM``
(reference: ingestion-elasticsearch.py:251,:291-296,:305-306).

The reference's own ``duration_hhmm`` has a bug (minutes computed as
*total* minutes, not minutes-past-the-hour — ingestion-elasticsearch.py:294);
per SURVEY.md §2.C we implement the correct semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_fmt_fr(col: Column) -> Column:
    """Timestamp → ``dd/MM/yyyy HH:mm:ss`` string
    (reference: ingestion-elasticsearch.py:251)."""
    return F.date_format(col, "dd/MM/yyyy HH:mm:ss")


def duration_hhmm(seconds: Column) -> Column:
    """Seconds → zero-padded ``HH:MM``
    (reference: ingestion-elasticsearch.py:291-296, bug fixed)."""
    secs = seconds.cast("long")
    return F.format_string(
        "%02d:%02d", F.floor(secs / 3600).cast("long"), (F.floor(secs / 60) % 60).cast("long")
    )
