"""Structured Streaming layer: the continuous-worker shape of the
reference (Kafka consumers → persist fan-out), rebuilt as streams with
checkpointed sinks and idempotent table merges."""
