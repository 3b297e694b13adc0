"""Setuptools shim.

All metadata lives in pyproject.toml (PEP 621). This file exists so the
package installs in environments that lack the `wheel` package (where
pip's PEP 517 editable path fails with `invalid command 'bdist_wheel'`):

    python setup.py develop        # legacy editable install
    pip install -e . --no-build-isolation   # preferred when wheel is present
"""

from setuptools import setup

setup()
