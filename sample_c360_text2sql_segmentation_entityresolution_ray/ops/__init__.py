"""General operator library: relational, dedup, ANN, clustering, text,
urls, sketches, windows, multimodal."""

from . import (  # noqa: F401
    ann,
    cluster,
    dedup,
    format,
    io,
    lm,
    model,
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
