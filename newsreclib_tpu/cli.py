"""Console-script entry points (reference ``setup.py:50-55``:
``train_command`` / ``eval_command``).

The repo-root ``train.py`` / ``eval.py`` / ``sweep.py`` scripts hold the
actual logic; installed entry points resolve them relative to the package so
``newsreclib-train experiment=...`` works from anywhere.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(module_name: str) -> None:
    sys.path.insert(0, _REPO_ROOT)
    import importlib

    importlib.import_module(module_name).main()


def train_command() -> None:
    _run("train")


def eval_command() -> None:
    _run("eval")


def sweep_command() -> None:
    _run("sweep")
