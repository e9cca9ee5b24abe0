"""Core runtime: stream/tag/settings model, block/graph abstractions, compiler,
scheduler, messages, registry (layers L0–L3 of SURVEY.md)."""
