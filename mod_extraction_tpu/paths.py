"""Repo-relative path constants.

Mirrors the reference's path registry (`mod_extraction/paths.py:8-16`) but
does NOT assert directory existence at import time — data/out dirs are
created lazily so the library is importable anywhere (tests, TPU pods).
"""

import os

ROOT_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CONFIGS_DIR = os.path.join(ROOT_DIR, "configs")
DATA_DIR = os.path.join(ROOT_DIR, "data")
MODELS_DIR = os.path.join(ROOT_DIR, "models")
OUT_DIR = os.path.join(ROOT_DIR, "out")


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
