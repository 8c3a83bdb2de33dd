"""Scoring service (app/service.py): job queue, worker, HTTP surface.

Beyond-reference serving mode: one worker thread owns the device, jobs
arrive over HTTP, artifacts land in the standard results layout.
"""

import http.client
import json
import os
import threading
import time

import numpy as np
import pytest

from pqa2_tpu.app.service import ScoringService
from pqa2_tpu.io.y4m import write_y4m
from pqa2_tpu.utils.signals import Signal


def _mk_pair(tmp_path, rng, n=4, h=48, w=64):
    ys = rng.integers(16, 220, (n, h, w)).astype(np.uint8)
    dist = np.clip(
        ys.astype(np.int16) + rng.integers(-5, 6, ys.shape), 0, 255
    ).astype(np.uint8)

    def frames(arr):
        return [
            {"y": y,
             "u": np.full((h // 2, w // 2), 128, np.uint8),
             "v": np.full((h // 2, w // 2), 128, np.uint8)}
            for y in arr
        ]

    rp, dp = str(tmp_path / "ref.y4m"), str(tmp_path / "dist.y4m")
    write_y4m(rp, frames(ys))
    write_y4m(dp, frames(dist))
    return rp, dp


def _wait(job, timeout=120.0):
    t0 = time.time()
    while job.status in ("queued", "running"):
        if time.time() - t0 > timeout:
            raise TimeoutError(f"job stuck in {job.status}")
        time.sleep(0.05)
    return job


@pytest.fixture
def service(tmp_path):
    svc = ScoringService(out_dir=str(tmp_path / "results"))
    yield svc
    svc.stop()


def test_submit_and_score(service, tmp_path, rng):
    rp, dp = _mk_pair(tmp_path, rng)
    service.start()
    job = service.submit({"reference": rp, "distorted": dp,
                          "precision": "float"})
    _wait(job)
    assert job.status == "done", job.error
    res = job.result
    assert 0.0 <= res["vmaf_score"] <= 100.0
    assert res["frame_count"] == 4
    assert os.path.exists(res["json_path"])
    # pooled_metrics carries the libvmaf log schema keys
    assert res["pooled_metrics"]["vmaf"]["mean"] == pytest.approx(
        res["vmaf_score"], abs=1e-4)
    # the response is JSON-serializable end to end
    json.dumps(job.to_dict())
    assert service.stats()["jobs_done"] == 1


def test_submit_10bit_pair(service, tmp_path, rng):
    """>8-bit sources score through the daemon untouched: depths come off
    the container, integer features run the native grid, PSNR reports the
    native peak and SSIM ffmpeg's depth-scaled constants."""
    n, h, w = 3, 48, 64
    ys = rng.integers(64, 960, (n, h, w)).astype(np.uint16)
    dist = np.clip(ys.astype(np.int32) + rng.integers(-20, 21, ys.shape),
                   0, 1023).astype(np.uint16)

    def frames(arr):
        return [
            {"y": y,
             "u": np.full((h // 2, w // 2), 512, np.uint16),
             "v": np.full((h // 2, w // 2), 512, np.uint16)}
            for y in arr
        ]

    rp, dp = str(tmp_path / "ref10.y4m"), str(tmp_path / "dist10.y4m")
    write_y4m(rp, frames(ys), colorspace="C420p10")
    write_y4m(dp, frames(dist), colorspace="C420p10")
    service.start()
    job = _wait(service.submit({"reference": rp, "distorted": dp,
                                "psnr": True, "ssim": True}))
    assert job.status == "done", job.error
    res = job.result
    assert 0.0 <= res["vmaf_score"] <= 100.0
    # Native 10-bit PSNR pools against the 1023 peak (a 255-peak pooling
    # would sit ~12 dB lower). Recompute psnr_avg independently: per-frame
    # all-plane MSE (chroma is identical -> zero SSE over h*w/2 pixels).
    sse_y = ((ys.astype(np.float64) - dist.astype(np.float64)) ** 2
             ).sum(axis=(1, 2))
    mse_avg = sse_y / (h * w * 1.5)
    want_psnr = float(np.mean(10 * np.log10(1023.0 ** 2 / mse_avg)))
    assert res["psnr_score"] == pytest.approx(want_psnr, abs=0.05)
    assert 0.0 < res["ssim_score"] <= 1.0
    json.dumps(job.to_dict())


def test_program_reuse_across_jobs(service, tmp_path, rng):
    """Same geometry twice: the second job reuses the worker's analyzer and
    in-process compiled programs (identical scores, no re-setup)."""
    rp, dp = _mk_pair(tmp_path, rng)
    service.start()
    j1 = _wait(service.submit({"reference": rp, "distorted": dp,
                               "precision": "float"}))
    j2 = _wait(service.submit({"reference": rp, "distorted": dp,
                               "precision": "float"}))
    assert j1.status == j2.status == "done"
    assert j2.result["vmaf_score"] == pytest.approx(
        j1.result["vmaf_score"], abs=1e-9)
    assert service._analyzer is not None  # built once, reused


def test_bad_specs_rejected(service):
    assert service.validate_spec({}) is not None
    assert service.validate_spec({"reference": "a"}) is not None
    assert service.validate_spec(
        {"reference": "a", "distorted": "b", "precision": "bogus"}
    ) is not None
    assert service.validate_spec(
        {"reference": "a", "distorted": "b", "nope": 1}
    ) is not None
    assert service.validate_spec(
        {"reference": "a", "distorted": "b", "subsample": "2"}
    ) is not None
    # bool subclasses int: true is not a valid subsample/duration
    assert service.validate_spec(
        {"reference": "a", "distorted": "b", "subsample": True}
    ) is not None
    assert service.validate_spec(
        {"reference": "a", "distorted": "b", "duration": True}
    ) is not None
    # explicit null = use the default, for every optional field
    assert service.validate_spec(
        {"reference": "a", "distorted": "b", "psnr": None, "model": None}
    ) is None
    assert service.validate_spec({"reference": "a", "distorted": "b"}) is None
    with pytest.raises(ValueError):
        service.submit({"reference": "a"})


def test_cancel_queued_job(service, tmp_path, rng):
    rp, dp = _mk_pair(tmp_path, rng)
    # Submit before the worker starts so the job is reliably still queued.
    job = service.submit({"reference": rp, "distorted": dp,
                          "precision": "float"})
    assert service.cancel(job.id) is True
    assert job.status == "cancelled"
    service.start()
    time.sleep(0.3)
    assert job.status == "cancelled"  # worker skipped it
    assert service.cancel("job-999") is False


def test_failed_job_reports_error_and_worker_survives(service, tmp_path, rng):
    service.start()
    bad = service.submit({"reference": "/nonexistent/a.y4m",
                          "distorted": "/nonexistent/b.y4m"})
    _wait(bad)
    assert bad.status == "error"
    assert bad.error
    # The worker is still alive and scores the next job.
    rp, dp = _mk_pair(tmp_path, rng)
    ok = _wait(service.submit({"reference": rp, "distorted": dp,
                               "precision": "float"}))
    assert ok.status == "done", ok.error
    assert service.stats()["jobs_failed"] == 1


def test_http_surface(service, tmp_path, rng):
    rp, dp = _mk_pair(tmp_path, rng)
    service.start()
    httpd = service.make_server(port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)

        def req(method, path, body=None):
            conn.request(method, path,
                         body=json.dumps(body) if body is not None else None)
            r = conn.getresponse()
            return r.status, json.loads(r.read() or b"{}")

        code, health = req("GET", "/healthz")
        assert code == 200 and health["status"] == "ok"

        code, models = req("GET", "/models")
        assert code == 200 and "vmaf_v0.6.1" in models["models"]

        code, out = req("POST", "/score",
                        {"reference": rp, "distorted": dp,
                         "precision": "float"})
        assert code == 202
        job_id = out["job_id"]

        deadline = time.time() + 120
        while True:
            code, j = req("GET", f"/jobs/{job_id}")
            assert code == 200
            if j["status"] not in ("queued", "running"):
                break
            assert time.time() < deadline
            time.sleep(0.1)
        assert j["status"] == "done", j.get("error")
        assert 0.0 <= j["result"]["vmaf_score"] <= 100.0

        code, listing = req("GET", "/jobs")
        assert code == 200 and listing["jobs"][0]["job_id"] == job_id

        code, err = req("POST", "/score", {"reference": rp})
        assert code == 400 and "distorted" in err["error"]

        code, _ = req("GET", "/jobs/job-404")
        assert code == 404
        # POST with a body the handler must drain even though the route
        # ignores it — the next keep-alive request would otherwise desync.
        code, _ = req("POST", f"/jobs/{job_id}/cancel", {"ignored": 1})
        assert code == 409  # finished, not queued
        code, health = req("GET", "/healthz?probe=1")  # query-safe routing
        assert code == 200 and health["status"] == "ok"
        code, listing = req("GET", "/jobs?limit=0")
        assert code == 200 and listing["jobs"] == []
        code, _ = req("GET", "/jobs?limit=x")
        assert code == 400
        code, _ = req("GET", "/bogus")
        assert code == 404
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_restart_after_stop(service, tmp_path, rng):
    """stop() then start() must yield a live worker (the stop event is
    cleared), not a silently dead queue."""
    rp, dp = _mk_pair(tmp_path, rng)
    service.start()
    ok = _wait(service.submit({"reference": rp, "distorted": dp,
                               "precision": "float"}))
    assert ok.status == "done", ok.error
    service.stop()
    service.start()
    again = _wait(service.submit({"reference": rp, "distorted": dp,
                                  "precision": "float"}), timeout=60)
    assert again.status == "done", again.error


def test_finished_job_retention_cap(service, monkeypatch):
    """A long-lived daemon prunes old finished jobs; queued jobs survive."""
    import pqa2_tpu.app.service as service_mod

    monkeypatch.setattr(service_mod, "_MAX_FINISHED_JOBS", 3)
    # Never start the worker: manufacture finished + queued jobs directly.
    jobs = [service.submit({"reference": "r", "distorted": "d"})
            for _ in range(6)]
    for j in jobs[:5]:
        service.cancel(j.id)
    service.submit({"reference": "r", "distorted": "d"})  # triggers prune
    listed = {j["job_id"]: j["status"] for j in service.jobs()}
    finished = [i for i, s in listed.items() if s == "cancelled"]
    assert len(finished) == 3  # oldest two pruned
    assert jobs[0].id not in listed and jobs[1].id not in listed
    assert jobs[5].id in listed  # queued jobs are never dropped
    assert len(service.jobs(limit=1)) == 1


def test_null_psnr_means_default_enabled(service, tmp_path, rng):
    rp, dp = _mk_pair(tmp_path, rng)
    service.start()
    job = _wait(service.submit({"reference": rp, "distorted": dp,
                                "precision": "float", "psnr": None,
                                "ssim": False}))
    assert job.status == "done", job.error
    assert job.result["psnr_score"] is not None
    assert job.result.get("ssim_score") in (None, 0, 0.0)


def test_json_safe_emits_strict_rfc_json():
    """Non-finite scores (PSNR inf on an identical pair, the common smoke
    case) must never reach clients as the non-RFC Infinity/NaN literals."""
    from pqa2_tpu.app.service import _json_safe

    out = _json_safe({
        "psnr_score": np.float64(np.inf),
        "neg": float("-inf"),
        "nan": np.float32("nan"),
        "arr": np.array([1.0, np.inf]),
        "i": np.int64(3),
    })
    back = json.loads(json.dumps(out, allow_nan=False))  # raises on inf/nan
    assert back["psnr_score"] == 1e9 and back["neg"] == -1e9
    assert back["nan"] is None
    assert back["arr"] == [1.0, 1e9]
    assert back["i"] == 3


def test_signal_connected_scope():
    sig = Signal(int, name="s")
    seen = []
    with sig.connected(seen.append):
        sig.emit(1)
    sig.emit(2)
    assert seen == [1]
