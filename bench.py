"""End-to-end benchmark: lidar frames/sec/chip (projection + FCN + decode).

The BASELINE north star (`BASELINE.json:5`): >= 500 full lidar frames/sec/
chip end-to-end on TPU v5e, with the whole per-frame pipeline — cylindrical
range-view projection, FCN forward, heatmap->pose decode — fused into one
jitted graph. The reference publishes no numbers (`BASELINE.json:13`), so
vs_baseline reports against the 500 f/s target.

Prints ONE JSON line on stdout; details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from tpufusion.config import DEFAULT
from tpufusion.data.synthetic import synthesize_points_batch
from tpufusion.decode.decode import decode_batch
from tpufusion.geometry.range_view import range_view_project_batch
from tpufusion.models.fcn import FCN

BATCH = 64
N_POINTS = 32768  # ~HDL-32E revolution
ITERS = 8
TARGET_FPS = 500.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = DEFAULT
    spec = cfg.range_view
    model = FCN(cfg.model, in_channels=3, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(model)

    @jax.jit
    def e2e(state, points):
        mdl = nnx.merge(graphdef, state)
        images = range_view_project_batch(points, spec)
        preds = mdl(images, train=False)
        out = decode_batch(preds, images, spec, cfg.decode)
        return out["pose"], out["found"]

    log(f"devices: {jax.devices()}")
    pts_batches = []
    for i in range(2):
        pts, _ = synthesize_points_batch(
            jax.random.PRNGKey(i), BATCH, N_POINTS
        )
        pts_batches.append(jax.device_put(np.asarray(pts)))

    t0 = time.perf_counter()
    jax.block_until_ready(e2e(state, pts_batches[0]))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # throughput: batched end-to-end
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = e2e(state, pts_batches[i % 2])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = BATCH * ITERS / dt
    log(f"throughput: {fps:.1f} frames/s ({dt / ITERS * 1e3:.1f} ms/batch)")

    # latency: single-frame path
    pts1 = pts_batches[0][:1]
    jax.block_until_ready(e2e(state, pts1))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(e2e(state, pts1))
        lats.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lats, 50) * 1e3)
    log(f"single-frame p50 latency: {p50:.2f} ms")

    print(
        json.dumps(
            {
                "metric": "lidar frames/sec/chip end-to-end (projection+FCN+decode)",
                "value": round(fps, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "p50_latency_ms": round(p50, 2),
                "batch": BATCH,
                "points_per_frame": N_POINTS,
            }
        )
    )


if __name__ == "__main__":
    main()
