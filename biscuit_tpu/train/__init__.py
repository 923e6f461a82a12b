"""Training, evaluation, UQ inference, and splitting."""

from . import splits  # noqa: F401


def __getattr__(name):
    if name in ("trainer", "uq", "evaluate"):
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(name)
