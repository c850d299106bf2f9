"""Distributed graph algorithms over partitioned CSR shards
(SURVEY.md sections 2.4, 3.3)."""
