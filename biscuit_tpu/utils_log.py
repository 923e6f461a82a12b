"""Shared logger (TPU-native stand-in for ``slideflow.util.log``,
referenced at /root/reference/biscuit/experiment.py:14 et al.)."""

from __future__ import annotations

import logging
import os

log = logging.getLogger("biscuit_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    log.addHandler(_h)
    log.setLevel(os.environ.get("BISCUIT_LOGLEVEL", "WARNING").upper())
# Reference code calls log.warn(); keep the alias.
log.warn = log.warning  # type: ignore[attr-defined]


def bold(text: str) -> str:
    """ANSI-bold a string (stand-in for sf.util.bold, experiment.py:768)."""
    return f"\033[1m{text}\033[0m"


def path_to_ext(path: str) -> str:
    """File extension without the dot (stand-in for sf.util.path_to_ext)."""
    _, ext = os.path.splitext(path)
    return ext.lstrip(".")


def path_to_name(path: str) -> str:
    """Filename without directory or extension."""
    return os.path.splitext(os.path.basename(path))[0]


def write_json(data, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def read_json(path: str):
    import json

    with open(path) as f:
        return json.load(f)
