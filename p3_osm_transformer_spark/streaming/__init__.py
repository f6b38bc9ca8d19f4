"""Checkpoint/resume + lineage metrics (batch-snapshot based)."""
