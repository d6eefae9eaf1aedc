"""Measure the streaming-inference H2D staging leak (and the ring fix).

Round-3 finding (NOTES.md): on the axon relay, every host->device
transfer retains its client-side staging buffer — a 60-epoch fusion run
was OOM-killed at 130 GB RSS, and an isolated probe showed 200 x 22 MB
`jnp.asarray` transfers retaining 3.2 GB. Training paths were fixed by
staging the dataset on device once; true STREAMING inference
(serve/replay.py) must move fresh input per chunk by nature.

This probe turns the round-3 assertion ("relay-side, not fixable from
user code") into a measurement, per VERDICT r4 #6: replay >= `--frames`
frames through the production ReplayHarness in both transfer modes —

  fresh : a fresh numpy view handed to device_put per chunk (status quo)
  ring  : a fixed ring of preallocated host staging buffers
          (ReplayHarness(host_ring=N) — np.copyto into a slot, transfer
          from the same buffer objects forever)

— sampling RSS every few chunks. If the relay keys its staging cache by
source buffer, `ring` holds RSS flat; if it retains per-call, both grow
at the same ~MB/frame slope and the leak is confirmed relay-side.

Run ON TPU: python -m tpufusion.tools.probe_h2d_leak --frames 10240
Prints one JSON line with per-mode RSS slopes for NOTES/BASELINE.
"""

from __future__ import annotations

import argparse
import gc
import json
import os

import jax
import numpy as np


def _rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError("no VmRSS")


def run_mode(host_ring: int, frames: int, chunk: int, n_points: int,
             sample_every: int = 4) -> dict:
    """Replay `frames` frames; return RSS samples + slope (MB/frame)."""
    from tpufusion.config import DEFAULT
    from tpufusion.serve.replay import ReplayHarness

    # a small stored set re-streamed many times: the TRANSFERS are fresh
    # every chunk (what leaks); the host source data stays constant-size
    rng = np.random.default_rng(0)
    stored = rng.standard_normal((chunk, n_points, 4)).astype(np.float32)

    harness = ReplayHarness(DEFAULT, chunk=chunk, host_ring=host_ring)
    n_chunks = frames // chunk
    rss = []
    # warm (compile + first transfers) before the measured window
    harness.run(stored)
    gc.collect()
    base = _rss_mb()
    for i in range(n_chunks):
        harness.run(stored)
        if i % sample_every == 0:
            gc.collect()
            rss.append(_rss_mb())
    xs = np.arange(len(rss), dtype=np.float64) * sample_every * chunk
    slope = (
        float(np.polyfit(xs, np.asarray(rss), 1)[0]) if len(rss) > 2 else 0.0
    )
    return {
        "mode": f"ring{host_ring}" if host_ring else "fresh",
        "rss_base_mb": round(base, 1),
        "rss_final_mb": round(rss[-1], 1),
        "rss_growth_mb": round(rss[-1] - base, 1),
        "mb_per_frame": round(slope, 4),
        "frames": n_chunks * chunk,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10240)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--n_points", type=int, default=32768)
    ap.add_argument("--ring", type=int, default=4)
    ap.add_argument("--modes", default="fresh,ring")
    args = ap.parse_args(argv)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    results = []
    for mode in args.modes.split(","):
        r = run_mode(
            args.ring if mode == "ring" else 0,
            args.frames, args.chunk, args.n_points,
        )
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"probe": "h2d_leak", "results": results}))
    return results


if __name__ == "__main__":
    main()
