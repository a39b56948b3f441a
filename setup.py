"""Thin setuptools shim (metadata lives in pyproject.toml).

Kept for the same reason the reference keeps one next to its
pyproject.toml (/root/reference/setup.py): environments without the
``wheel`` package (this container has no network to fetch it) can still
do an editable install via the legacy path:

    pip install -e . --no-build-isolation --no-use-pep517
"""

from setuptools import setup

setup()
