"""Structured Streaming pipelines — the reference's four DStream apps
re-expressed as unbounded-DataFrame transforms (SURVEY.md §3).

Every pipeline is a pure DataFrame→DataFrame function, so the same code
runs in batch (tests, backfills) and streaming (production) — the core
Structured Streaming design win the reference's DStream code lacked.
"""
