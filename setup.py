"""Shim for wheel-less environments.

All metadata lives in pyproject.toml (PEP 621).  This file exists only so
`pip install -e . --no-build-isolation --no-use-pep517` (the legacy
``setup.py develop`` path) works on hosts that have setuptools but not the
``wheel`` package — e.g. an air-gapped sandbox where build isolation
cannot download a backend.
"""

from setuptools import setup

setup()
