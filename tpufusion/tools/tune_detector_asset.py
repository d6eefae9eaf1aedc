"""Tune a detector asset's decode operating point on held-out scenes.

The reference hard-coded its decode thresholds (min_prob 0.5,
min_bbox_area 100, `modules/lidar/train/predict.py:28-31`) to its real
bags; tpufusion assets ship WITH the operating point they validated at
(asset json "decode", applied by tpufusion.benchmarks). This tool sweeps
(min_prob x min_bbox_area x center mode) for a trained asset on the
128-frame fixed protocol, confirms the winner on a second disjoint
seed set (operating points overfit too), and rewrites the asset json.

Run: python -m tpufusion.tools.tune_detector_asset [--asset ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np
from flax import nnx

from tpufusion.config import DEFAULT
from tpufusion.models.fcn import FCN
from tpufusion.models.io import load_state_npz
from tpufusion.tools.train_synthetic_detector import (
    ASSET,
    evaluate,
    prepare_eval_batches,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset", default=ASSET)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_points", type=int, default=32768)
    ap.add_argument("--eval_batches", type=int, default=4)
    ap.add_argument("--confirm_seed", type=int, default=5999,
                    help="disjoint seed base for the confirmation eval")
    ap.add_argument("--write", action=argparse.BooleanOptionalAction,
                    default=True, help="rewrite the asset json with the winner")
    ap.add_argument("--per_resolution", default="",
                    help="comma list of points-per-frame resolutions to "
                         "calibrate separately (e.g. 16384,32768,65536): "
                         "for each, re-sweep min_prob x min_bbox_area with "
                         "the winning center mode fixed and write the "
                         "per-resolution overrides to the asset json's "
                         "decode_per_resolution table (applied by "
                         "benchmarks.decode_for_resolution). Mixed-"
                         "resolution training does not transfer the "
                         "operating point (NOTES.md round 3); this ships "
                         "the calibration.")
    args = ap.parse_args(argv)

    with open(args.asset + ".json") as f:
        meta = json.load(f)
    mcfg = meta["model"]
    head = mcfg.get("head", "corner")
    model = FCN(
        dataclasses.replace(
            DEFAULT.model, dtype="bfloat16",
            reg_output_activation=mcfg.get("reg_output_activation", "relu"),
            width_multiplier=mcfg.get("width_multiplier", 1),
            head=head,
            yaw_codec=mcfg.get("yaw_codec", "single"),
        ),
        in_channels=3, rngs=nnx.Rngs(0),
    )
    load_state_npz(args.asset, model)
    graphdef, state = nnx.split(model)
    spec = DEFAULT.range_view
    scenes = meta.get("scenes", "beam")
    max_yaw = meta.get("max_yaw", 0.05)

    # the yaw-channel codec is a property of the WEIGHTS, not of the
    # operating point: evaluate (and rewrite) with the frame the asset
    # was trained with, or a global-codec asset gets decoded through the
    # local rotation (config default) and its yaw turns to noise
    yaw_frame = meta.get("decode", {}).get("direct_yaw_frame", "global")
    # "fit" boundary model: from the asset json when pinned, else derived
    # from the scene family (data/synthetic.py::surface_fit_params — the
    # single source of truth for the ray-cast surface insets)
    from tpufusion.data.synthetic import surface_fit_params

    boundary_default, scale_default = surface_fit_params(scenes)
    fit_boundary = meta.get("decode", {}).get(
        "fit_boundary", boundary_default
    )
    fit_scale = meta.get("decode", {}).get(
        "fit_surface_scale", scale_default
    )
    base_decode = dataclasses.replace(
        DEFAULT.decode, direct_yaw_frame=yaw_frame,
        fit_boundary=fit_boundary, fit_surface_scale=fit_scale,
    )

    probs = (0.5, 0.7, 0.8, 0.9)
    areas = (8.0, 12.0, 20.0, 40.0)
    modes = (
        ("fit", "consensus", "silhouette", "surface", "head", "geometric",
         "backproject")
        if head == "direct" else (None,)
    )
    # mixed-family assets tune on the same per-family protocol they were
    # selected by (trainer _eval_mode): evaluate each family at its
    # training yaw cap and average — _synth("mixed") itself would fall
    # through to the legacy uniform-clutter generator
    families = (
        ["beam", "beam-ellipse", "beam-box"] if scenes == "mixed"
        else [scenes]
    )

    def fam_yaw(fam):
        return min(max_yaw, 0.05) if fam == "beam" else max_yaw

    # the scenes + projection + FCN forward are identical for every
    # operating point: prepare them once per family, sweep only the decode
    def prepare_all(n_points, seed=999):
        return {
            f: prepare_eval_batches(
                graphdef, state, spec, args.batch, n_points, seed=seed,
                max_yaw=fam_yaw(f), scenes=f, n_batches=args.eval_batches,
            )
            for f in families
        }

    def eval_mean(dcfg, center, n_points, prepared=None, seed=999):
        per_fam = [
            evaluate(
                graphdef, state, spec, dcfg, args.batch, n_points,
                seed=seed, max_yaw=fam_yaw(f), head=head, scenes=f,
                center=center, n_batches=args.eval_batches,
                prepared=None if prepared is None else prepared[f],
            )
            for f in families
        ]
        if len(per_fam) == 1:
            return per_fam[0]
        return {k: float(np.mean([e[k] for e in per_fam]))
                for k in per_fam[0]}

    prepared = prepare_all(args.n_points)
    rows = []
    for mp in probs:
        for ar in areas:
            dcfg = dataclasses.replace(
                base_decode, min_prob=mp, min_bbox_area=ar
            )
            for mode in modes:
                ev = eval_mean(dcfg, mode, args.n_points,
                               prepared=prepared)
                rows.append({"min_prob": mp, "min_bbox_area": ar,
                             "center": mode, **ev})
                print(
                    f"p>={mp} area>={ar} {mode or '-':<11} "
                    f"det {ev['det']:.2f} iou {ev['mean_iou']:.3f} "
                    f"r25 {ev['recall_iou25']:.2f} xy {ev['xy_err']:.2f} "
                    f"score {ev['score']:.3f}", flush=True,
                )

    best = max(rows, key=lambda r: r["score"])
    print("\nbest on protocol:", json.dumps(best))

    dcfg = dataclasses.replace(
        base_decode, min_prob=best["min_prob"],
        min_bbox_area=best["min_bbox_area"],
    )
    confirm = eval_mean(dcfg, best["center"], args.n_points,
                        seed=args.confirm_seed)
    print("confirmation (disjoint seeds):", json.dumps(confirm))

    # per-resolution calibration: the winning center mode is a property
    # of the weights; the detection threshold is a property of the input
    # density. Sweep thresholds per resolution, confirm on disjoint
    # seeds, and record only the fields that differ from the base point.
    per_res = {}
    if args.per_resolution:
        for npts in (int(c) for c in args.per_resolution.split(",")):
            prep_r = prepare_all(npts)
            rrows = []
            # sparse sweeps need FAR lower thresholds than the sweep
            # grid's floor suggests: at 16k points the flagship's det
            # goes 0.77 -> 0.94 between min_prob 0.3 and 0.05 (round 4,
            # fenced 128-frame protocol) — the classifier's confidence
            # scales with per-pixel occupancy, not with object presence
            for mp in (0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9):
                for ar in (8.0, 20.0):
                    dr = dataclasses.replace(
                        base_decode, min_prob=mp, min_bbox_area=ar
                    )
                    ev = eval_mean(dr, best["center"], npts,
                                   prepared=prep_r)
                    rrows.append(
                        {"min_prob": mp, "min_bbox_area": ar, **ev}
                    )
            rbest = max(rrows, key=lambda r: r["score"])
            dr = dataclasses.replace(
                base_decode, min_prob=rbest["min_prob"],
                min_bbox_area=rbest["min_bbox_area"],
            )
            rconf = eval_mean(dr, best["center"], npts,
                              seed=args.confirm_seed)
            per_res[str(npts)] = {
                "min_prob": rbest["min_prob"],
                "min_bbox_area": rbest["min_bbox_area"],
            }
            print(
                f"resolution {npts}: min_prob {rbest['min_prob']} "
                f"area {rbest['min_bbox_area']} det {rbest['det']:.2f} "
                f"iou {rbest['mean_iou']:.3f} "
                f"(confirm det {rconf['det']:.2f} "
                f"iou {rconf['mean_iou']:.3f})", flush=True,
            )

    if args.write:
        meta["decode"] = {"min_prob": best["min_prob"],
                          "min_bbox_area": best["min_bbox_area"]}
        if best["center"]:
            meta["decode"]["direct_center"] = best["center"]
        if head == "direct":
            meta["decode"]["direct_yaw_frame"] = yaw_frame
            meta["decode"]["fit_boundary"] = fit_boundary
            meta["decode"]["fit_surface_scale"] = fit_scale
        step = meta.get("best", {}).get("step")
        meta["best"] = {
            k: best[k]
            for k in ("det", "xy_err", "within2m", "mean_iou",
                      "recall_iou25", "yaw_err", "score")
            if k in best
        }
        meta["best"]["center"] = best["center"]
        meta["best"]["step"] = step
        meta["confirmation"] = confirm
        if per_res:
            meta["decode_per_resolution"] = per_res
        with open(args.asset + ".json", "w") as f:
            json.dump(meta, f)
        print("asset json updated ->", args.asset + ".json")


if __name__ == "__main__":
    main()
