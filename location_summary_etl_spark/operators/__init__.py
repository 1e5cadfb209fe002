"""Operator library: one well-named, unit-tested function per operator
family from SURVEY.md §2, plus the LLM-pipeline extension operators."""
