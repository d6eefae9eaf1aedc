"""Pallas TPU kernel for the range-view nearest-wins z-buffer.

The projection's collision rule (reference semantics at
`modules/lidar/process/extract_rosbag_lidar.py:64-71`: nearest point by
full L2 wins a pixel, ties to the lowest point index) is implemented in
XLA as a 2-key `lax.sort` (`ops/scatter.nearest_wins_sort`) costing
~50 ms of the 63 ms e2e chunk at batch 64 x 32k points — ~80% of the
whole pipeline (BASELINE.md per-stage table). This kernel attempts the
SURVEY §7 step-1 plan instead: an on-chip scatter-min.

Formulation: TPUs have no per-lane dynamic addressing, so a scatter is
inherently scalar-serialized; the only question is the constant factor
against XLA's sort (the sort's XLA alternatives measured: scatter-min
85 ms, sort16 100 ms, 2-key sort 80 ms per 64-batch — NOTES.md rounds
2-3). Here the whole per-frame reduction is one pass of scalar
read-modify-writes against on-chip state:

    p = pix[i]; k = key[i]
    if k < best[p]: best[p] = k; win[p] = i

Processing points in increasing index order with a strict compare makes
the lowest-index tie-break automatic (the stable sort's property), so
the result is bit-identical to `nearest_wins_sort` — golden-tested
against it (tests/test_geometry.py, tests/test_tpu_hardware.py).

Memory layout is dictated by Mosaic's scalar-access rules (scalar RMW is
only legal in SMEM; v5e SMEM is 1 MB total; dynamic scalar loads from
VMEM require 128-aligned indices):

  * `win` — the only pipelined output block, SMEM; doubles as the
    occupancy signal (occupied pixels end >= 0) so `best` never leaves
    the chip;
  * `best` — single-buffered SMEM scratch;
  * per-frame state init is NOT a scalar loop (57,632 iterations of
    SMEM stores cost ~2x the point loop — measured, NOTES round 5):
    constant sentinel rows (-1 / INT32_MAX) are DMA'd from HBM into the
    SMEM state at frame start, so the scalar core only ever walks
    points;
  * the per-point streams stay whole in HBM and are streamed through a
    double-buffered pair of SMEM chunk buffers by explicit async DMAs,
    the next chunk's copy in flight while the scalar core drains the
    current one.

Grid = (batch,): one program instance per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT32_MAX = jnp.iinfo(jnp.int32).max

_CHUNK = 4096  # points per DMA tile (2 x 16 KB SMEM per slot)


def _scatter_kernel(pix_hbm, key_hbm, neg1_hbm, max_hbm, win_ref,
                    best_ref, pix_smem0, pix_smem1, key_smem0, key_smem1,
                    sems, *, n: int, unroll: int, style: str):
    g = pl.program_id(0)
    pix_slots = (pix_smem0, pix_smem1)
    key_slots = (key_smem0, key_smem1)

    init_dmas = (
        pltpu.make_async_copy(neg1_hbm, win_ref, sems.at[2, 0]),
        pltpu.make_async_copy(max_hbm, best_ref, sems.at[2, 1]),
    )

    def dma_pair(c, slot):
        return (
            pltpu.make_async_copy(
                pix_hbm.at[g, :, pl.ds(c * _CHUNK, _CHUNK)],
                pix_slots[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                key_hbm.at[g, :, pl.ds(c * _CHUNK, _CHUNK)],
                key_slots[slot], sems.at[slot, 1],
            ),
        )

    for d in (*init_dmas, *dma_pair(0, 0)):
        d.start()
    for d in init_dmas:
        d.wait()

    nchunks = n // _CHUNK
    # static chunk loop: SMEM slot slices must be tiling-aligned, which
    # rules out a dynamic slot index — nchunks is small (8 at N=32k)
    for c in range(nchunks):
        slot = c % 2
        if c + 1 < nchunks:
            for d in dma_pair(c + 1, (c + 1) % 2):
                d.start()
        for d in dma_pair(c, slot):
            d.wait()
        base = c * _CHUNK

        def rmw(p, k, i):
            b = best_ref[0, p]
            if style == "branch":
                @pl.when(k < b)
                def _():
                    best_ref[0, p] = k
                    win_ref[0, 0, p] = i
            else:  # "select": branchless, unconditional stores
                lt = k < b
                w = win_ref[0, 0, p]
                best_ref[0, p] = jnp.where(lt, k, b)
                win_ref[0, 0, p] = jnp.where(lt, i, w)

        def body(j, carry2, slot=slot, base=base, rmw=rmw):
            jbase = j * unroll
            if style == "hoist":
                # issue the unroll-block's independent stream loads
                # first, then run the (serially dependent) RMWs
                pk = [
                    (pix_slots[slot][0, jbase + u],
                     key_slots[slot][0, jbase + u])
                    for u in range(unroll)
                ]
                for u, (p, k) in enumerate(pk):
                    b = best_ref[0, p]

                    @pl.when(k < b)
                    def _(p=p, k=k, i=base + jbase + u):
                        best_ref[0, p] = k
                        win_ref[0, 0, p] = i
            else:
                for u in range(unroll):
                    p = pix_slots[slot][0, jbase + u]
                    k = key_slots[slot][0, jbase + u]
                    rmw(p, k, base + jbase + u)
            return carry2

        jax.lax.fori_loop(0, _CHUNK // unroll, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("num_pixels", "unroll", "style", "interpret"),
)
def nearest_wins_pallas_batch(
    pixel_ids: jax.Array,  # (B, N) int32 in [0, num_pixels)
    key_bits: jax.Array,  # (B, N) int32 sortable encoding; INT32_MAX = invalid
    num_pixels: int,
    unroll: int = 8,
    style: str = "branch",
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Batched nearest-wins winner: returns (winner (B, P), occupied (B, P)).

    Callers encode invalidity in the inputs: invalid points must carry
    key_bits == INT32_MAX (never wins: the best grid starts there and the
    compare is strict) and an in-range pixel id (it is used as a load
    address before the compare). Valid keys are < INT32_MAX by
    construction (sortable bits of finite non-negative floats).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = pixel_ids.shape
    if n % _CHUNK:
        pad = _CHUNK - n % _CHUNK
        pixel_ids = jnp.pad(pixel_ids, ((0, 0), (0, pad)))
        key_bits = jnp.pad(
            key_bits, ((0, 0), (0, pad)), constant_values=_INT32_MAX
        )
        n += pad
    neg1 = jnp.full((1, 1, num_pixels), -1, jnp.int32)
    max32 = jnp.full((1, num_pixels), _INT32_MAX, jnp.int32)
    win = pl.pallas_call(
        functools.partial(_scatter_kernel, n=n, unroll=unroll,
                          style=style),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, num_pixels), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, num_pixels), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1, num_pixels), jnp.int32),
            pltpu.SMEM((1, _CHUNK), jnp.int32),
            pltpu.SMEM((1, _CHUNK), jnp.int32),
            pltpu.SMEM((1, _CHUNK), jnp.int32),
            pltpu.SMEM((1, _CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        interpret=interpret,
    )(pixel_ids[:, None, :], key_bits[:, None, :], neg1, max32)
    win = win[:, 0, :]
    return jnp.maximum(win, 0), win >= 0
