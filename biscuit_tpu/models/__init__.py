"""Model zoo: Xception tile classifier (flagship) and presets."""

from .xception import (  # noqa: F401
    ARCHS,
    Head,
    XceptionBackbone,
    XceptionClassifier,
    build_model,
    feature_dim,
)
