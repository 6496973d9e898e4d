"""Codec-selection state, lineage records, checkpoint/resume helpers."""
