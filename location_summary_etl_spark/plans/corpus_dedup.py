"""Corpus module: filled in as operators land."""
