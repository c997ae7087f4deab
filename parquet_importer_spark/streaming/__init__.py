"""Structured Streaming surface (SURVEY §2.I).

The reference's 50k-row chunked import loop (app.py:111-193) is a
hand-rolled micro-batch pipeline; its Spark analog is
``readStream → transform → writeStream.foreachBatch`` with exactly the
same at-least-once append semantics — plus the things the loop could
never do: event-time windows, watermarks, stateful dedup.
"""
