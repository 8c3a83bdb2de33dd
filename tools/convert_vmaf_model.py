#!/usr/bin/env python
"""Convert libvmaf JSON model files into pqa2_tpu's dense .npz registry format.

Usage:
    python tools/convert_vmaf_model.py SRC.json [SRC2.json ...] -o OUTDIR

The conversion parses the param_dict/model_dict structure and the embedded
libsvm nu-SVR text block (support vectors, coefficients, gamma, rho) into
numpy arrays; see pqa2_tpu/models/loader.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pqa2_tpu.models.loader import load_model, save_model_npz  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sources", nargs="+")
    ap.add_argument("-o", "--outdir", default="pqa2_tpu/models/data")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    for src in args.sources:
        name = os.path.basename(src).rsplit(".json", 1)[0]
        model = load_model(src, name=name)
        out = os.path.join(args.outdir, f"{name}.npz")
        save_model_npz(model, out)
        kind = type(model).__name__
        print(f"{src} -> {out} ({kind})")


if __name__ == "__main__":
    main()
