"""Sphinx configuration for the viabel-tpu documentation.

Counterpart of the reference's Sphinx/RTD setup (reference
docs/source/conf.py, .readthedocs.yml).  Build with ``make docs``; the dev
image does not bundle sphinx, so the target explains how to install it
(RTD/CI installs docs/requirements.txt).
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "viabel-tpu"
author = "viabel-tpu developers"
copyright = "2026, viabel-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
]

# jax and friends are heavyweight; autodoc only needs signatures/docstrings
autodoc_mock_imports = []
autodoc_member_order = "bysource"
napoleon_numpy_docstring = True
napoleon_google_docstring = False

exclude_patterns = ["_build"]
html_theme = "alabaster"
master_doc = "index"
