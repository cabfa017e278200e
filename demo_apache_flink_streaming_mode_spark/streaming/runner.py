"""Streaming query lifecycle + observability helpers.

The W3 late-data policy (SURVEY.md §2.6): Spark drops rows behind the
watermark instead of side-outputting them; the engine makes the drops
observable here, and the batch twin ``operators.eventtime.classify_late``
reproduces the late/on-time split as a column for audit.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def watermark_metrics(query: StreamingQuery) -> dict:
    """Aggregate late-data observability over a query's retained progress.

    Returns {dropped_rows, watermark, batches}: total rows dropped for
    arriving behind the watermark (the reference's late side output
    would have received these), the final watermark, and batch count.
    """
    dropped = 0
    batches = 0
    watermark = None
    for p in query.recentProgress:
        batches += 1
        for op in p.get("stateOperators", []):
            dropped += op.get("numRowsDroppedByWatermark", 0)
        watermark = p.get("eventTime", {}).get("watermark", watermark)
    return {"dropped_rows": dropped, "watermark": watermark, "batches": batches}
