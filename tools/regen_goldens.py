#!/usr/bin/env python
"""Regenerate tests/goldens/regression_golden.json from the current pipeline.

The regression goldens are literals that catch UNINTENDED numeric drift;
after a DELIBERATE numeric change (e.g. round 3's exact LUT statistic and
the NEG clamp-order correction), the affected entries are regenerated with
this tool and the change is justified in the commit message.

Usage:
    python tools/regen_goldens.py            # print deltas, dry run
    python tools/regen_goldens.py --write    # rewrite the golden file

The synthetic clip recipe is frozen (tests/test_goldens.py docstring) —
never change it, or every pin silently loses its lineage.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                      "regression_golden.json")


def make_clip(n, h, w):
    rng = np.random.default_rng(20260816)
    base = (rng.uniform(16, 235, (1, h, w))
            + rng.uniform(-18, 18, (n, 1, 1)) + rng.normal(0, 9, (n, h, w)))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref = np.round(np.clip(base, 0, 255))
    dist = np.round(np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255))
    return ref.astype(np.float32), dist.astype(np.float32)


def main():
    from pqa2_tpu.pipeline.scoring import score_clip

    write = "--write" in sys.argv
    with open(GOLDEN) as f:
        g = json.load(f)
    ref, dist = make_clip(g["n"], g["h"], g["w"])

    def update(section, model, precision):
        res = score_clip(ref, dist, model=model, chunk_size=4,
                         precision=precision)
        old = np.asarray(g[section][model], dtype=float)
        new = np.asarray(res.vmaf, dtype=float)
        d = float(np.max(np.abs(new - old)))
        print(f"{section}/{model} ({precision}): max delta {d:.6f}")
        g[section][model] = [round(float(v), 6) for v in new]
        return res

    for model in g["vmaf"]:
        update("vmaf", model, "float")
    res_int = None
    for model in g["vmaf_integer"]:
        r = update("vmaf_integer", model, None)  # model-driven default
        if model == "vmaf_v0.6.1":
            res_int = r

    # Per-frame feature tables: update the recomputable fields IN PLACE
    # (rows also carry ssim_y/psnr_y etc. that other tests pin — fields
    # not recomputed here are preserved).
    res_f = score_clip(ref, dist, chunk_size=4, precision="float")
    res_fn = score_clip(ref, dist, model="vmaf_v0.6.1neg", chunk_size=4,
                        precision="float")
    res_i = score_clip(ref, dist, chunk_size=4, precision="integer")

    def fields(res, i):
        return {
            "adm2": round(float(res.features["adm2"][i]), 8),
            "motion2": round(float(res.features["motion2"][i]), 8),
            "vif": [round(float(res.features[f"vif_scale{s}"][i]), 8)
                    for s in range(4)],
        }

    for i, row in enumerate(g["frames"]):
        row.update(fields(res_f, i))
        neg = fields(res_fn, i)
        row["adm2_neg"] = neg["adm2"]
        row["vif_neg"] = neg["vif"]
    for i, row in enumerate(g["frames_integer"]):
        row.update(fields(res_i, i))

    if write:
        with open(GOLDEN, "w") as f:
            json.dump(g, f, indent=1)
        print(f"wrote {GOLDEN}")
    else:
        print("dry run (pass --write to update)")


if __name__ == "__main__":
    main()
