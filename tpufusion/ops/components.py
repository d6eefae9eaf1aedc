"""Connected-component labeling in fixed-shape XLA.

Replaces `scipy.ndimage.measurements.label` used by the reference decode
(`modules/lidar/train/predict.py:53`). scipy's default structuring element is
4-connectivity; we reproduce that with iterative min-propagation: every
foreground pixel starts labeled with its own flat index, then repeatedly takes
the minimum label of its 4-neighborhood until a fixed point. The result labels
each component by the smallest flat pixel index it contains — which is also
the first pixel scipy's scanner encounters, so ordering components by our
label value matches scipy's 1..K numbering order.

Each sweep is a cross-shaped max-pool (labels are negated so reduce_window's
max implements min-propagation) — two cheap `reduce_window` calls, no
scatter. The loop is a `lax.while_loop` with an iteration cap: convergence
needs at most the longest geodesic path inside a component, tiny for the
compact 32x1801 range-view heat blobs; the cap bounds pathological inputs.

connected_components_with_bbox fuses the per-cluster bounding-box fixed
point into the same loop: any two 4-adjacent foreground pixels belong to the
same final cluster, so running extents merge unconditionally alongside the
labels, sparing the four segment-scatter reductions a post-hoc pass would
need (XLA:TPU scatters with colliding indices serialize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.iinfo(jnp.int32).max - 1


def _cross_max_sweep(st: jax.Array, fg: jax.Array) -> jax.Array:
    """One 4-neighborhood max propagation of (C, H, W) channels, restricted
    to foreground pixels."""
    h = jax.lax.reduce_window(
        st, -_BIG, jax.lax.max, (1, 1, 3), (1, 1, 1),
        ((0, 0), (0, 0), (1, 1)),
    )
    v = jax.lax.reduce_window(
        st, -_BIG, jax.lax.max, (1, 3, 1), (1, 1, 1),
        ((0, 0), (1, 1), (0, 0)),
    )
    return jnp.where(fg[None], jnp.maximum(h, v), -_BIG)


def _propagate(st0: jax.Array, mask: jax.Array, max_iters: int) -> jax.Array:
    # four sweeps per trip amortize the convergence check (which reads both
    # full states); a segmented-scan full-row propagation was tried and is
    # ~7x SLOWER end to end (associative_scan's custom-op carries dwarf the
    # plain reduce_window sweeps) — see NOTES.md
    def cond(state):
        i, st, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, st, _ = state
        nxt = st
        for _ in range(4):
            nxt = _cross_max_sweep(nxt, mask)
        return i + 1, nxt, jnp.any(nxt != st)

    _, st, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), st0, jnp.bool_(True))
    )
    return st


def connected_components(mask: jax.Array, max_iters: int = 128) -> jax.Array:
    """Label 4-connected components of a 2D boolean mask.

    Returns int32 labels with shape == mask.shape: background pixels get -1;
    each foreground pixel gets the smallest flat index of its component.
    """
    h, w = mask.shape
    flat_ids = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    st0 = jnp.where(mask, -flat_ids, -_BIG)[None]
    st = _propagate(st0, mask, max_iters)
    return jnp.where(mask, -st[0], -1)


def connected_components_with_bbox(mask: jax.Array, max_iters: int = 128):
    """Labels plus per-pixel cluster bbox (min_x, max_x, min_y, max_y).

    Background pixels: label -1 and undefined extents.
    """
    h, w = mask.shape
    flat_ids = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def init(chan):
        return jnp.where(mask, chan, -_BIG)

    st0 = jnp.stack(
        [init(-flat_ids), init(-cols), init(cols), init(-rows), init(rows)],
        axis=0,
    )
    st = _propagate(st0, mask, max_iters)
    labels = jnp.where(mask, -st[0], -1)
    return labels, -st[1], st[2], -st[3], st[4]
