"""Composed pipelines and the oracle query corpus."""
