"""General operator library: relational, dedup, ANN, text, urls,
sketches, windows, multimodal."""

from . import (  # noqa: F401
    ann,
    dedup,
    format,
    io,
    multimodal,
    packing,
    profile,
    relational,
    sampling,
    sketch,
    text,
    urls,
    window,
)
