"""Command-line interface.

The reference is GUI-only; this CLI exposes the same engine layer headlessly:

  python -m pqa2_tpu.cli score REF DIST [--model M] [--out DIR] ...
  python -m pqa2_tpu.cli align REF CAPTURE [--out DIR]
  python -m pqa2_tpu.cli capture REF [--duration S]     (file-playback backend)
  python -m pqa2_tpu.cli full REF CAPTURE               (align + score + report)
  python -m pqa2_tpu.cli batch LADDER.json              (multi-clip suite)
  python -m pqa2_tpu.cli serve [--port P] [--warmup]    (persistent HTTP service)
  python -m pqa2_tpu.cli probe VIDEO
  python -m pqa2_tpu.cli models
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import List, Optional


def _add_score_args(p):
    p.add_argument("--model", default="vmaf_v0.6.1")
    p.add_argument("--out", default=None, help="output directory")
    p.add_argument("--test-name", default=None)
    p.add_argument("--duration", type=float, default=None)
    p.add_argument("--pool", default="mean",
                   choices=["mean", "min", "max", "harmonic_mean"])
    p.add_argument("--subsample", type=int, default=1)
    p.add_argument("--precision", default="auto",
                   choices=["auto", "integer", "integer_fast", "float"],
                   help="feature family: auto follows the model (integer "
                        "models -> integer, the bit-faithful fixed-point "
                        "path incl. the exact LUT statistic); integer_fast "
                        "smooths the statistic's logs to f32 (~4%% faster, "
                        "score delta <=1e-3); float forces the f32 kernels")
    p.add_argument("--no-psnr", action="store_true")
    p.add_argument("--no-ssim", action="store_true")


def cmd_score(args) -> int:
    from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer

    analyzer = VMAFAnalyzer()
    analyzer.model = args.model
    analyzer.pool_method = args.pool
    analyzer.feature_subsample = args.subsample
    analyzer.feature_precision = (
        None if args.precision == "auto" else args.precision)
    analyzer.psnr_enabled = not args.no_psnr
    analyzer.ssim_enabled = not args.no_ssim
    if args.out:
        analyzer.set_output_directory(args.out)
    if args.test_name:
        analyzer.set_test_name(args.test_name)
    analyzer.status_update.connect(lambda m: print(f"[score] {m}", file=sys.stderr))
    results = analyzer.analyze_videos(
        args.reference, args.distorted, model=args.model, duration=args.duration
    )
    if results is None:
        return 1
    print(json.dumps({
        "vmaf": results["vmaf_score"],
        "psnr": results["psnr_score"],
        "ssim": results["ssim_score"],
        "frames": results["frame_count"],
        "json_path": results["json_path"],
    }, default=str))
    return 0


def cmd_align(args) -> int:
    from pqa2_tpu.app.bookend_aligner import BookendAligner

    aligner = BookendAligner()
    aligner.status_update.connect(lambda m: print(f"[align] {m}", file=sys.stderr))
    res = aligner.align_bookend_videos(args.reference, args.capture)
    if res is None:
        return 1
    print(json.dumps({k: res[k] for k in (
        "aligned_reference", "aligned_captured", "offset_frames",
        "offset_seconds", "confidence", "is_fallback")}))
    return 0


def cmd_capture(args) -> int:
    from pqa2_tpu.app.capture import CaptureManager, FilePlaybackBackend
    from pqa2_tpu.io.video import probe_video

    info = probe_video(args.reference)
    cm = CaptureManager(backend=FilePlaybackBackend(noise_sigma=args.noise))
    cm.set_output_directory(args.out or ".")
    cm.set_test_name(args.test_name or "capture")
    cm.set_reference_video(info)
    done: List = []
    cm.capture_finished.connect(lambda ok, p: done.append((ok, p)))
    cm.status_update.connect(lambda m: print(f"[capture] {m}", file=sys.stderr))
    if not cm.start_bookend_capture(args.device):
        return 1
    cm.wait()
    if not done or not done[0][0]:
        return 1
    print(json.dumps({"capture_path": done[0][1]}))
    return 0


def cmd_full(args) -> int:
    """Combined workflow: align then score then report
    (the reference AnalysisTab pipeline, app/ui/tabs/analysis_tab.py:174).
    Decode-once fast path: alignment and scoring share the in-memory frames
    (app/workflow.py)."""
    from pqa2_tpu.app.report_generator import ReportGenerator
    from pqa2_tpu.app.workflow import run_combined_workflow

    out_dir = args.out or os.path.dirname(args.capture) or "."
    combined = run_combined_workflow(
        args.reference, args.capture, out_dir=out_dir, model=args.model
    )
    if combined is None:
        return 1
    res = combined["alignment"]
    results = combined["analysis"]
    gen = ReportGenerator()
    pdf = gen.generate_report(results, os.path.join(out_dir, "report.pdf"))
    html = gen.generate_html_report(results, os.path.join(out_dir, "report.html"))
    csvp = gen.export_csv(results, os.path.join(out_dir, "frames.csv"))
    print(json.dumps({
        "vmaf": results["vmaf_score"],
        "psnr": results["psnr_score"],
        "ssim": results["ssim_score"],
        "alignment_confidence": res["confidence"],
        "report_pdf": pdf, "report_html": html, "csv": csvp,
    }, default=str))
    return 0


def cmd_batch(args) -> int:
    from pqa2_tpu.pipeline.batch import run_batch_suite

    with open(args.ladder) as f:
        spec = json.load(f)
    summary = run_batch_suite(
        spec, out_dir=args.out or "batch_results", model=args.model,
        log=lambda m: print(f"[batch] {m}", file=sys.stderr),
    )
    print(json.dumps(summary, default=str))
    return 0


def cmd_dryrun(args) -> int:
    """Compile + run the sharded scoring step on an n-device mesh, forcing
    a virtual CPU mesh when fewer real devices exist (jax must not have
    initialised a backend yet — this command imports it first)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    if args.platform:
        # Must happen before any backend query; config-level because
        # interpreter startup hooks override the env var.
        jax.config.update("jax_platforms", args.platform)
    if jax.device_count() < args.devices:
        print(f"cannot provide {args.devices} devices", file=sys.stderr)
        return 1
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as graft

    graft.dryrun_multichip(args.devices)
    return 0


def cmd_serve(args) -> int:
    """Persistent scoring service (app/service.py): one worker thread owns
    the device, jobs arrive over HTTP, compiled programs amortize across
    requests."""
    from pqa2_tpu.app.service import serve_forever

    serve_forever(host=args.host, port=args.port, out_dir=args.out,
                  warmup=args.warmup)
    return 0


def cmd_probe(args) -> int:
    from pqa2_tpu.io.video import probe_video

    print(json.dumps(probe_video(args.video), default=str))
    return 0


def cmd_models(args) -> int:
    from pqa2_tpu.models.registry import available_models, get_model

    out = {}
    for name in available_models():
        m = get_model(name)
        if hasattr(m, "models"):
            out[name] = {"type": "bootstrap", "n_models": m.n_models,
                         "features": list(m.feature_names)}
        else:
            out[name] = {"type": "nusvr", "n_sv": m.n_sv,
                         "features": list(m.feature_names)}
    print(json.dumps(out, indent=2))
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    if os.environ.get("JAX_PLATFORMS"):
        # Honor the env var at config level: interpreter startup hooks on
        # some hosts register a hardware plugin and pin the platform
        # programmatically, which silently overrides the env var (same
        # workaround as tests/conftest.py). Must run before any backend
        # query; `dryrun` additionally exposes --platform.
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from pqa2_tpu.utils.stacklimit import raise_stack_limit

    raise_stack_limit()  # deep XLA:CPU compiles overflow the 8 MB default
    parser = argparse.ArgumentParser(prog="pqa2_tpu", description=__doc__)
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument(
        "--models-dir", default=None,
        help="directory of user libvmaf model JSONs (also: PQA2_MODELS_DIR "
             "env var, or the paths.models_dir setting in the GUI)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("score", help="score a ref/dist pair")
    p.add_argument("reference")
    p.add_argument("distorted")
    _add_score_args(p)
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("align", help="bookend-align a capture to a reference")
    p.add_argument("reference")
    p.add_argument("capture")
    p.set_defaults(fn=cmd_align)

    p = sub.add_parser("capture", help="simulated capture (file playback)")
    p.add_argument("reference")
    p.add_argument("--device", default="FilePlayback")
    p.add_argument("--out", default=None,
                   help="output DIRECTORY (the capture file is named "
                        "inside it, CaptureManager path policy)")
    p.add_argument("--test-name", default=None)
    p.add_argument("--noise", type=float, default=2.0)
    p.set_defaults(fn=cmd_capture)

    p = sub.add_parser("full", help="align + score + report")
    p.add_argument("reference")
    p.add_argument("capture")
    p.add_argument("--model", default="vmaf_v0.6.1")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_full)

    p = sub.add_parser("batch", help="multi-clip ladder suite")
    p.add_argument("ladder", help="JSON spec: {pairs: [[ref, dist], ...]}")
    p.add_argument("--model", default="vmaf_v0.6.1")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("serve", help="persistent scoring service (HTTP)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8990)
    p.add_argument("--out", default=None, help="artifact directory")
    p.add_argument("--warmup", action="store_true",
                   help="compile-warm the scorer with a tiny synthetic job "
                        "before listening")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("probe", help="video metadata")
    p.add_argument("video")
    p.set_defaults(fn=cmd_probe)

    p = sub.add_parser("dryrun", help="multi-chip sharding compile check")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--platform", default="cpu",
                   help="cpu (default: virtual mesh) | tpu | '' = leave as-is")
    p.set_defaults(fn=cmd_dryrun)

    p = sub.add_parser("models", help="list packaged models")
    p.set_defaults(fn=cmd_models)

    args = parser.parse_args(argv)
    if args.models_dir:
        from pqa2_tpu.models.registry import set_user_models_dir

        set_user_models_dir(args.models_dir)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    if args.cmd in ("score", "align", "capture", "full", "batch", "dryrun",
                    "serve"):
        # Compute subcommands only: deciding whether the cache applies may
        # initialize the JAX backend, which can block on an unreachable
        # remote TPU runtime — `pqa2 --help` / `models` / `probe` must
        # never pay (or hang on) that.
        from pqa2_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
