"""General operator library: relational, dedup, ANN, text, multimodal."""

from . import ann, dedup, multimodal, relational, text  # noqa: F401
