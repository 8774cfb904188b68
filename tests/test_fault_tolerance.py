"""Failure-injection: Ray Data must complete pipelines through worker
death (the routine event on a 256-node cluster — Ray retries tasks
whose worker process died and reconstructs lost blocks via lineage).

The injected fault is a hard ``os._exit`` (process kill), not a Python
exception: application exceptions are NOT retried by default and
should surface to the caller — that contract is asserted too."""

from __future__ import annotations

import os

import pytest

import ray
import ray.data


def test_map_batches_survives_worker_death(tmp_path):
    marker = str(tmp_path / "died_once")

    def _fn(batch):
        # exactly ONE task attempt kills its worker (atomic file create)
        if not os.path.exists(marker):
            try:
                with open(marker, "x"):
                    pass
                os._exit(1)
            except FileExistsError:
                pass
        return batch

    total = (
        ray.data.range(1000, override_num_blocks=8)
        .map_batches(_fn)
        .sum("id")
    )
    assert total == 999 * 1000 // 2
    assert os.path.exists(marker)  # the kill really happened


def test_application_exception_is_not_swallowed():
    def _bad(batch):
        raise ValueError("application bug")

    with pytest.raises(Exception, match="application bug"):
        ray.data.range(10).map_batches(_bad).materialize()
