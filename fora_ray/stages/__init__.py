"""map_batches stage functions for the ingest pipeline (SURVEY.md section 2.2)."""
