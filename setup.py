"""Legacy-path shim: `pip install -e . --no-build-isolation --no-use-pep517`
works in offline environments whose setuptools predates PEP-660 editable
wheels (all metadata lives in pyproject.toml)."""
from setuptools import setup

setup()
