"""Scalar / vectorized helper functions (SURVEY.md section 2.6)."""
