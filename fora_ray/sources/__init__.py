"""Sources / sinks (SURVEY.md section 2.1)."""
