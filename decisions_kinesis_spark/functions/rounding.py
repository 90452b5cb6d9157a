"""Cross-engine-stable rounding.

Spark ``round()`` is HALF_UP while DuckDB rounds doubles HALF_EVEN, so
any value that lands exactly on a half at the target precision (easy
to hit with decimal sums divided by small counts) diverges between the
engines.  ``floor(x·1e4 + 0.5) / 1e4`` is the same IEEE op sequence in
both, so half-way cases agree — use this for every 4dp double that an
oracle compares.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fl4(col: Column) -> Column:
    """Floor-based 4-decimal round (see module doc)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000.0
