"""Operator tools: model verification, export, training-log analysis,
dataset scans, loader smoke test (reference L5, SURVEY.md §1)."""
