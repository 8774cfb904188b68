"""General operator library: relational, dedup, ANN, text, multimodal."""

from . import (  # noqa: F401
    ann,
    dedup,
    format,
    io,
    multimodal,
    profile,
    relational,
    sampling,
    text,
)
