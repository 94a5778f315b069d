# Sphinx configuration — the generated-docs pipeline (the reference
# publishes Doxygen+Sphinx to ReadTheDocs: /root/reference/.readthedocs.yaml,
# docs/sphinx/; this is the Python-native equivalent: autodoc over the
# package + the hand-written markdown spec rendered via MyST).
#
# Build locally:  pip install sphinx myst-parser && sphinx-build -b html docs docs/_build
# CI builds it in the `docs` lane (.github/workflows/ci.yml).

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "tinyopt_tpu"
author = "tinyopt_tpu authors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_typehints = "description"
# jax and the native runtime may be absent/slow in doc builds — mock them
autodoc_mock_imports = []

myst_enable_extensions = ["colon_fence"]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

exclude_patterns = ["_build"]
html_theme = "alabaster"
