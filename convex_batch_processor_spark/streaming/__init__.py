"""Streaming subsystem: the batch accumulator as Structured Streaming."""
