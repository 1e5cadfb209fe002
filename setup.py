"""Legacy-tooling shim.

All metadata lives in pyproject.toml (PEP 621), and all builds --
including on hosts WITHOUT the ``wheel`` package -- go through the
in-tree PEP 517 backend (_build_backend.py), which pip uses
automatically; ``pip install -e .`` needs nothing from this file.
(pip refuses ``--no-use-pep517`` for any project that declares a
build-backend, so that flag is not an escape hatch here.)

This file exists only for tooling that still invokes setup.py
directly (``python setup.py develop`` / ``sdist`` in old CI recipes).
"""

from setuptools import setup

setup()
