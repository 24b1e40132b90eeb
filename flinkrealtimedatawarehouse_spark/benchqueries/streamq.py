"""Structured-Streaming driver queries (SURVEY.md §2.10 T-rows).

Each callable runs a real streaming query (parquet file source ->
watermarked transformation -> memory sink) to completion with
``trigger(availableNow=True)`` and returns the sink contents as a batch
DataFrame — proving the streaming form end-to-end under the driver's
correctness gate. Filled in by the streaming module.
"""

from __future__ import annotations

REGISTRY: dict = {}
