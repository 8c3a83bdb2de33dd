"""CLI + results store tests."""

import json
import os

import numpy as np
import pytest

from pqa2_tpu.app.results_store import ResultsStore, write_compact_metadata
from pqa2_tpu.cli import main as cli_main
from pqa2_tpu.io.y4m import write_y4m


@pytest.fixture
def clip_pair(tmp_path, rng):
    n, h, w = 3, 48, 64
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref_y = np.round(base).astype(np.uint8)
    dist_y = np.clip(
        ref_y.astype(np.int16) + rng.integers(-4, 5, ref_y.shape), 0, 255
    ).astype(np.uint8)

    def mk(ys):
        return [
            {"y": ys[i],
             "u": np.full((h // 2, w // 2), 128, np.uint8),
             "v": np.full((h // 2, w // 2), 128, np.uint8)}
            for i in range(n)
        ]

    ref_path = str(tmp_path / "ref.y4m")
    dist_path = str(tmp_path / "dist.y4m")
    write_y4m(ref_path, mk(ref_y))
    write_y4m(dist_path, mk(dist_y))
    return ref_path, dist_path


def test_cli_score(clip_pair, tmp_path, capsys):
    ref, dist = clip_pair
    rc = cli_main(["score", ref, dist, "--out", str(tmp_path / "out")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert 0 <= out["vmaf"] <= 100
    assert os.path.exists(out["json_path"])


def test_cli_probe_and_models(clip_pair, capsys):
    ref, _ = clip_pair
    assert cli_main(["probe", ref]) == 0
    probe = json.loads(capsys.readouterr().out)
    assert probe["width"] == 64
    assert cli_main(["models"]) == 0
    models = json.loads(capsys.readouterr().out)
    assert "vmaf_v0.6.1" in models
    assert models["vmaf_b_v0.6.3"]["type"] == "bootstrap"


def test_cli_batch(clip_pair, tmp_path, capsys):
    ref, dist = clip_pair
    ladder = str(tmp_path / "ladder.json")
    json.dump({"pairs": [[ref, dist], [ref, ref]]}, open(ladder, "w"))
    rc = cli_main(["batch", ladder, "--out", str(tmp_path / "suite")])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["n_clips"] == 2
    assert all("vmaf" in c for c in summary["clips"])
    assert os.path.exists(tmp_path / "suite" / "batch_summary.json")
    # HTML report per clip
    assert any(
        f.endswith("_report.html")
        for _, _, files in os.walk(tmp_path / "suite") for f in files
    )


def test_results_store_roundtrip(clip_pair, tmp_path):
    from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer

    ref, dist = clip_pair
    base = str(tmp_path / "results")
    store = ResultsStore(base)
    analyzer = VMAFAnalyzer()

    for name in ("testA", "testB"):
        test_dir = os.path.join(base, f"{name}_20260101_000000")
        os.makedirs(test_dir, exist_ok=True)
        analyzer.set_output_directory(test_dir)
        analyzer.set_test_name(name)
        results = analyzer.analyze_videos(ref, dist)
        write_compact_metadata(results, test_dir)

    tests = store.list_tests()
    assert len(tests) == 2
    assert all("vmaf_score" in t for t in tests)

    full = store.load_full(tests[0]["test_dir"])
    assert "frames" in full and "pooled_metrics" in full

    csv_path = store.export_combined_csv(str(tmp_path / "combined.csv"))
    text = open(csv_path).read()
    assert "testA" in text and "testB" in text

    assert store.delete(tests[0]["test_dir"])
    assert len(store.list_tests()) == 1
    # refuses to delete outside base
    assert not store.delete(str(tmp_path))


def test_compact_metadata_truncation(tmp_path):
    frames = [{"frameNum": i, "metrics": {"vmaf": float(i)}} for i in range(20)]
    results = {"vmaf_score": 50.0, "raw_results": {"frames": frames}}
    p = write_compact_metadata(results, str(tmp_path))
    meta = json.load(open(p))
    assert meta["frames_truncated"] is True
    assert len(meta["frames"]) == 10
    assert meta["frames"][0]["frameNum"] == 0
    assert meta["frames"][-1]["frameNum"] == 19
