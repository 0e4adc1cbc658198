"""Structured Streaming surface (SURVEY.md §2.9).

The reference's raw layer is a hand-rolled 5-second polling loop
(``/root/reference/src/raw/raw_layer.py:41,142-153``) with a JSON
watermark file; these jobs are the idiomatic replacements —
checkpointed Structured Streaming with availableNow / processingTime
triggers, watermarks for late data, and windowed/stateful aggregation.
"""
