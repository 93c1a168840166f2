"""Structured Streaming layer.

Modules:
    sources.py  — source constructors (file-replay, rate, Kinesis-shaped stub)
    state.py    — stateful processors (override TTL, as-of matcher)
    pipeline.py — the reference's three pipelines (transmitter, receiver,
                  command plane) as streaming jobs
    jobs.py     — driver-checkable streaming queries (availableNow replay,
                  results equal their batch analogs)
    fixtures.py — deterministic stream fixtures (targets, frames, commands,
                  acks) for replay tests
"""
