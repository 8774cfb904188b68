"""Checkpoint manifests, job-status registry, retention policies."""
