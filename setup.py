"""Shim for legacy editable installs (`python setup.py develop`).

All metadata lives in pyproject.toml (setuptools >= 61 reads it from
here too). This file exists because PEP 660 editable installs through
pip require the `wheel` package for setuptools < 70.1, which an offline
box may not have — `setup.py develop` is the wheel-free fallback the
packaging test uses when `pip install -e .` can't build an editable
wheel.
"""

from setuptools import setup

setup()
