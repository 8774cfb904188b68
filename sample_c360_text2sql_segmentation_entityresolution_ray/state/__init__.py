"""Checkpoint manifests, job-status registry, retention GC."""

from .checkpoint import (  # noqa: F401
    JobStatusRegistry,
    gc_checkpoints,
    load_manifest,
    run_stage,
)
