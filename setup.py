"""Legacy-path shim: all metadata lives in pyproject.toml's [project]
table (setuptools >= 61 reads it). Exists so environments without the
`wheel` package (PEP 660 editable builds need bdist_wheel) can still
`pip install -e .` through setup.py develop."""

from setuptools import setup

setup()
