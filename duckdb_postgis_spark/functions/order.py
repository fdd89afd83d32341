"""Total ordering for small results without a range-exchange stage.

``df.orderBy(cols)`` plans Exchange(rangepartitioning) + Sort — a full extra
stage whose scheduling cost dwarfs sorting when the result is a handful of
aggregate rows. For bounded outputs, ``coalesce(1)`` (narrow — no shuffle)
followed by ``sortWithinPartitions`` produces the identical total order in
the same stage. Use ONLY when |result| is known-small (final aggregates,
pivots); large results must keep the parallel range sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def sorted_small(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Totally ordered small result, exchange-free (see module docstring)."""
    return df.coalesce(1).sortWithinPartitions(*cols)
