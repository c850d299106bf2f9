"""End-to-end Dataset pipelines (SURVEY.md section 3.3)."""
