"""Streaming replay harness with latency/throughput accounting.

The latency-critical serving loop the BASELINE metric targets (config 2:
64-frame chunked replay through projection+FCN+decode). Replaces rosbag
playback + the ROS node (`modules/lidar/process/rosplayback_with_lidar_and_
tf.sh`, which had to replay at 0.05x because the CPU pipeline couldn't keep
up) with a host loop over stored frames feeding micro-batches to one fused
device graph, staying a batch ahead so H2D overlaps compute.

Profiling hooks mirror the reference's cProfile-behind-a-flag
(`lidar_predict.py:21-23`): pass profile_dir to capture a jax.profiler
trace of the steady-state window.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np
from flax import nnx

from tpufusion.config import PipelineConfig, DEFAULT
from tpufusion.models.fcn import FCN


@dataclasses.dataclass
class LatencyStats:
    batch_seconds: list
    batch_size: int

    @property
    def frames(self) -> int:
        return len(self.batch_seconds) * self.batch_size

    def percentile_ms(self, q: float) -> float:
        per_frame = np.asarray(self.batch_seconds) / self.batch_size
        return float(np.percentile(per_frame, q) * 1e3)

    @property
    def throughput_fps(self) -> float:
        return self.frames / float(np.sum(self.batch_seconds))

    def summary(self) -> dict:
        return {
            "frames": self.frames,
            "fps": round(self.throughput_fps, 1),
            "p50_ms_per_frame": round(self.percentile_ms(50), 3),
            "p99_ms_per_frame": round(self.percentile_ms(99), 3),
        }


class ReplayHarness:
    def __init__(
        self,
        cfg: PipelineConfig = DEFAULT,
        model: FCN | None = None,
        chunk: int = 64,
        host_ring: int = 0,
    ):
        """host_ring > 0 routes every H2D transfer through a fixed ring
        of that many preallocated host staging buffers (np.copyto into a
        ring slot, device_put from the slot) instead of handing jax a
        fresh numpy view per chunk. True streaming inference must move
        fresh input per chunk by nature; on the axon relay each transfer
        was measured to retain its client-side staging buffer (~0.5-2
        MB/frame, NOTES.md round 3). The ring bounds the SOURCE buffers
        to a constant set so a pointer-keyed staging cache could reuse
        them — tools/probe_h2d_leak.py measures whether the relay
        actually does (flat RSS) or retains per-call regardless."""
        self.cfg = cfg
        self.chunk = chunk
        self.model = model or FCN(cfg.model, in_channels=3, rngs=nnx.Rngs(0))
        graphdef, state = nnx.split(self.model)
        self._state = state
        self._host_ring = host_ring
        self._ring: list | None = None
        from tpufusion.predict import make_e2e_step

        self._step = make_e2e_step(
            graphdef, cfg.range_view, cfg.decode, cfg.projection_method
        )

    def _stage(self, host_chunk: np.ndarray, slot: int):
        """H2D transfer, through the staging ring when enabled."""
        if not self._host_ring:
            return jax.device_put(host_chunk)
        # device_put is async: with one slot the copyto for chunk b+1
        # could overwrite the buffer while chunk b's transfer is still in
        # flight. With >= 2 slots a slot's previous transfer was consumed
        # (np.asarray on its step's output) before the slot comes around.
        assert self._host_ring >= 2, "host_ring must be >= 2 (async H2D)"
        if self._ring is None:
            self._ring = [
                np.empty_like(host_chunk) for _ in range(self._host_ring)
            ]
        buf = self._ring[slot % self._host_ring]
        np.copyto(buf, host_chunk)
        return jax.device_put(buf)

    def run(
        self,
        points: np.ndarray,  # (F, N, 4) stored frames
        timestamps: np.ndarray | None = None,
        profile_dir: str | None = None,
    ) -> tuple[np.ndarray, np.ndarray, LatencyStats]:
        f = len(points)
        nb = (f + self.chunk - 1) // self.chunk
        assert nb > 0, "need at least one frame"
        # pad the trailing partial chunk (repeat the last frame) so no
        # frame is silently dropped
        pad = nb * self.chunk - f
        if pad:
            points = np.concatenate(
                [points, np.repeat(points[-1:], pad, axis=0)]
            )
        poses = np.zeros((nb * self.chunk, 7), np.float32)
        founds = np.zeros((nb * self.chunk,), bool)

        # warm the executable (compile outside the timed region)
        warm = self._stage(points[: self.chunk], 0)
        p, fd = self._step(self._state, warm)
        _ = np.asarray(p[0, 0])

        if profile_dir is not None:
            jax.profiler.start_trace(profile_dir)
        times = []
        pending = self._stage(points[: self.chunk], 0)
        for b in range(nb):
            t0 = time.perf_counter()
            batch = pending
            if b + 1 < nb:  # stay one transfer ahead
                pending = self._stage(
                    points[(b + 1) * self.chunk : (b + 2) * self.chunk],
                    b + 1,
                )
            p, fd = self._step(self._state, batch)
            lo = b * self.chunk
            poses[lo : lo + self.chunk] = np.asarray(p)
            founds[lo : lo + self.chunk] = np.asarray(fd)
            times.append(time.perf_counter() - t0)
        if profile_dir is not None:
            jax.profiler.stop_trace()

        return poses[:f], founds[:f], LatencyStats(times, self.chunk)
