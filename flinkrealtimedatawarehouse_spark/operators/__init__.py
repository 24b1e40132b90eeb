"""Batch/DataFrame re-expressions of the reference's operator inventory
(SURVEY.md §2). Each module cites the reference file:line it covers."""
