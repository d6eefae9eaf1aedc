"""Honest device timing on relay-backed TPUs.

Two hazards on the axon-tunneled backend (measured, see bench.py notes):
`block_until_ready` can return before remote execution finishes, and
identical dispatches may be served from a relay cache. `measure` therefore
uses distinct input sets per iteration and fences with a device->host
scalar readback of the final output (execution is in-order, so that is a
barrier for the whole run).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np


def force(tree) -> None:
    """Materialize every leaf to host (hard barrier)."""
    for leaf in jax.tree.leaves(tree):
        _ = np.asarray(leaf.ravel()[-1])


def measure(fn, argsets: list[tuple], reps: int = 2) -> float:
    """Mean seconds per call: len(argsets)*reps dispatches, one fence."""
    r = fn(*argsets[0])
    force(r)
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for a in argsets:
            r = fn(*a)
            n += 1
    _ = np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


@contextmanager
def stopwatch(label: str, sink: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = dt
