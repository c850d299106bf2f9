"""Checkpoint / resume / lineage (SURVEY.md section 4.3)."""
