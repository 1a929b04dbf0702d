"""Structured Streaming surface.

The reference has NO streaming semantics (SURVEY.md §2.9), so v1 keeps the
engine batch-first; this module shows the same operators composing unchanged
under ``readStream`` — incremental mention detection with ``foreachBatch``
and a watermarked tumbling aggregation over the events table — so streaming
ingest is a deployment choice, not a rewrite.
"""

from .jobs import streaming_event_counts, streaming_mentions  # noqa: F401
