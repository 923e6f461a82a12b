"""Data plane: TFRecord I/O, tile pipeline, stain normalization,
augmentation, and WSI tile extraction."""

from . import proto, tfrecord  # noqa: F401


def __getattr__(name):
    # Lazy: normalize/augment/pipeline import jax.
    if name in ("normalize", "augment", "pipeline", "slide"):
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(name)
