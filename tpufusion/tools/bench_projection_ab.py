"""Fenced in-session A/B of range-view projection formulations on TPU.

VERDICT r4 #2: the 2-key XLA sort is ~50 ms of the 63 ms e2e chunk
(~80%, BASELINE per-stage table) and was only ever A/B'd against other
XLA formulations — this tool measures the Pallas VMEM scatter-min
(`ops/pallas_projection.py`) against it under the measurement discipline
NOTES.md prescribes: one process, distinct inputs per dispatch, a
device->host readback fence (utils/profiling.measure), beam-structured
scans at the headline protocol (batch 64 x 32k points).

Run ON TPU:  python -m tpufusion.tools.bench_projection_ab
Prints one JSON line per method + an e2e A/B of the production graph.
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from tpufusion.config import DEFAULT
from tpufusion.data.synthetic import synthesize_beam_scan_batch
from tpufusion.utils.profiling import measure


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n_points", type=int, default=32768)
    ap.add_argument("--sets", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--methods", default="exact,pallas")
    ap.add_argument("--e2e", action="store_true",
                    help="also A/B the full projection+FCN+decode graph")
    args = ap.parse_args(argv)

    spec = DEFAULT.range_view
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    argsets = []
    for s in range(args.sets):
        pts, _, vmask = synthesize_beam_scan_batch(
            jax.random.PRNGKey(500 + s), args.batch, args.n_points
        )
        argsets.append(
            (jnp.asarray(pts), jnp.asarray(vmask))
            if vmask is not None else (jnp.asarray(pts), None)
        )

    from tpufusion.geometry.range_view import range_view_project_batch

    results = {}
    for method in args.methods.split(","):
        fn = jax.jit(
            functools.partial(range_view_project_batch, spec=spec,
                              method=method)
        )
        dt = measure(lambda p, v: fn(p, valid=v), argsets, reps=args.reps)
        ms = dt * 1e3
        results[method] = round(ms, 2)
        print(json.dumps({
            "stage": "projection", "method": method,
            "ms_per_chunk": round(ms, 2),
            "frames_per_s": round(args.batch / dt, 1),
        }), flush=True)

    if args.e2e:
        # the headline production graph (bench.py FLAGSHIP geometry)
        import dataclasses

        from flax import nnx

        from tpufusion.models.fcn import FCN
        from tpufusion.predict import make_e2e_step

        model = FCN(
            dataclasses.replace(
                DEFAULT.model, dtype="bfloat16", head="direct",
                width_multiplier=2, reg_output_activation="linear",
            ),
            in_channels=3, rngs=nnx.Rngs(0),
        )
        model.deconv6a.bias[:] = jnp.asarray([2.0, -2.0])
        graphdef, state = nnx.split(model)
        for method in args.methods.split(","):
            fn = make_e2e_step(graphdef, spec, DEFAULT.decode, method,
                               head="direct")
            dt = measure(
                lambda p, v: fn(state, p, v), argsets, reps=args.reps
            )
            results[f"e2e_{method}"] = round(dt * 1e3, 2)
            print(json.dumps({
                "stage": "e2e", "method": method,
                "ms_per_chunk": round(dt * 1e3, 2),
                "frames_per_s": round(args.batch / dt, 1),
            }), flush=True)

    print(json.dumps({"probe": "projection_ab", "results": results}))
    return results


if __name__ == "__main__":
    main()
