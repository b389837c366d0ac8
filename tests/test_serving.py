"""Texture-generation HTTP service (unitex_tpu/serving.py): submit jobs over
the real HTTP surface (path-based and base64-inlined), poll to completion,
fetch artifacts, and exercise the error paths."""

import base64
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from unitex_tpu.config import (
    BakeConfig,
    CameraConfig,
    MeshConfig,
    PipelineConfig,
)
from unitex_tpu.geometry.io.mesh_io import save_mesh
from unitex_tpu.geometry.primitives import make_icosphere
from unitex_tpu.pipeline import CustomRGBTextureFullPipeline
from unitex_tpu.serving import serve


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_assets")
    mesh_path = str(d / "input.glb")
    save_mesh(mesh_path, make_icosphere(3))
    img = np.full((128, 128, 3), 255, np.uint8)
    img[32:96, 32:96] = [40, 90, 200]
    img_path = str(d / "image.png")
    Image.fromarray(img).save(img_path)
    return mesh_path, img_path


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = PipelineConfig(
        camera=CameraConfig(view_size=64),
        mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=128),
        bake=BakeConfig(uv_size=128),
    )
    pipe = CustomRGBTextureFullPipeline(pretrain_models=None, seed=63, config=cfg)
    work = str(tmp_path_factory.mktemp("serve_work"))
    httpd = serve(pipe, work, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.jobs.stop()
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _wait(base, job_id, timeout_s=600):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        _, body = _get(f"{base}/jobs/{job_id}")
        rec = json.loads(body)
        if rec["status"] in ("done", "failed"):
            return rec
        time.sleep(0.5)
    raise TimeoutError(f"job {job_id} did not finish")


class TestServing:
    def test_healthz(self, server):
        status, body = _get(server + "/healthz")
        assert status == 200
        assert json.loads(body)["ok"] is True

    def test_path_job_roundtrip(self, server, assets):
        mesh_path, img_path = assets
        status, resp = _post(
            server + "/jobs",
            {"image_path": img_path, "mesh_path": mesh_path, "name": "tex1"},
        )
        assert status == 202
        rec = _wait(server, resp["id"])
        assert rec["status"] == "done", rec.get("error")
        assert rec["name"] == "tex1"
        assert rec["device_s"] > 0 and rec["preprocess_s"] > 0

        status, glb = _get(f"{server}/jobs/{resp['id']}/result")
        assert status == 200
        assert glb[:4] == b"glTF"
        status, png = _get(f"{server}/jobs/{resp['id']}/rembg")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_b64_job(self, server, assets):
        mesh_path, img_path = assets
        with open(mesh_path, "rb") as f:
            mesh_b64 = base64.b64encode(f.read()).decode()
        with open(img_path, "rb") as f:
            img_b64 = base64.b64encode(f.read()).decode()
        _, resp = _post(
            server + "/jobs",
            {"image_b64": img_b64, "mesh_b64": mesh_b64, "mesh_ext": ".glb"},
        )
        rec = _wait(server, resp["id"])
        assert rec["status"] == "done", rec.get("error")
        status, glb = _get(f"{server}/jobs/{resp['id']}/result")
        assert status == 200 and glb[:4] == b"glTF"

    def test_job_listing(self, server):
        status, body = _get(server + "/jobs")
        assert status == 200
        assert isinstance(json.loads(body), list)

    def test_unknown_job_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server + "/jobs/deadbeef")
        assert e.value.code == 404

    def test_result_not_ready_409(self, server, assets):
        mesh_path, img_path = assets
        # a failing job: nonexistent mesh path
        _, resp = _post(
            server + "/jobs",
            {"image_path": img_path, "mesh_path": "/nonexistent.glb"},
        )
        rec = _wait(server, resp["id"])
        assert rec["status"] == "failed" and "error" in rec
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{server}/jobs/{resp['id']}/result")
        assert e.value.code == 409

    def test_bad_request_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server + "/jobs", {"mesh_ext": ".exe"})
        assert e.value.code == 400


class TestPrewarm:
    def test_prewarm_then_job(self, assets, tmp_path):
        """prewarm=True loads the default-bucket executables on the device
        worker before the first job and records the per-stage breakdown;
        real jobs still complete afterwards."""
        from unitex_tpu.serving import TextureJobServer

        mesh_path, img_path = assets
        cfg = PipelineConfig(
            camera=CameraConfig(view_size=64),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=128),
            bake=BakeConfig(uv_size=128),
        )
        pipe = CustomRGBTextureFullPipeline(
            pretrain_models=None, seed=63, config=cfg
        )
        srv = TextureJobServer(pipe, str(tmp_path), prewarm=True)
        jid = srv.submit(img_path, mesh_path)
        for _ in range(600):
            rec = srv.public_record(jid)
            if rec["status"] in ("done", "failed"):
                break
            time.sleep(0.5)
        assert rec["status"] == "done", rec
        assert srv.prewarm_timings is not None
        assert set(srv.prewarm_timings) == {
            "host_preprocess", "render_geometry", "infer_mv", "reproject"
        }
        srv.stop()


class TestWindowedBatchDriver:
    """scripts/batch_pipeline._run_windowed: the --sr-window serving loop
    must (1) denoise the whole window before any SR, (2) run EVERY grid's
    SR inside ONE sr_pipeline.staged() weight window, (3) bake each asset
    afterwards — the ~2.3 GB SD3 staging transfer then amortizes 1/k
    (E2E_r05_sr.json measures the real thing)."""

    def test_phase_ordering_and_single_staging_window(self, tmp_path):
        import contextlib
        import os
        import sys
        import types

        sys.path.insert(0, "scripts")
        import batch_pipeline as bp

        events = []

        class StubSR:
            def __init__(self):
                self.windows = 0
                self.inside = 0

            @contextlib.contextmanager
            def staged(self):
                self.windows += 1
                events.append("stage_in")
                yield
                events.append("stage_out")

        class StubPipe:
            def __init__(self):
                self.sr_pipeline = StubSR()

            def preprocess_job(self, out_dir, image, mesh):
                events.append(("pre", os.path.basename(image)))
                return ("mesh:" + image, "img:" + image)

            def render_geometry_images_stage(self, cache, pm):
                events.append(("geo", pm))
                return {"mesh": pm, "c2ws": 0, "intrinsics": 0}

            def infer_mv_stage(self, cache, img, cond, apply_sr=True):
                assert apply_sr is False
                events.append(("mv", img))
                return np.zeros((4, 6, 3), np.float32)

            def _apply_sr(self, mv, save_dir=None):
                self.sr_pipeline.inside += 1
                events.append("sr")
                return mv

            def reproject_stage(self, cache, mesh, mv, cond, pm):
                events.append(("bake", pm))
                p = os.path.join(cache, "textured_mesh.glb")
                open(p, "wb").write(b"x")
                # rembg copy expects this file
                open(os.path.join(cache, "rembg_image.png"), "wb").write(b"x")
                return p

            def _submit_io(self, fn, *a):
                fn(*a)

        jobs = [{"name": f"j{i}", "image": f"{i}.png", "mesh": f"{i}.obj"}
                for i in range(4)]
        args = types.SimpleNamespace(
            out=str(tmp_path), sr_window=2, keep_going=False,
            no_artifacts=True)
        pipe = StubPipe()
        results = []
        bp._run_windowed(args, pipe, jobs, None, None, None, results)

        assert pipe.sr_pipeline.windows == 2          # one per window of 2
        assert pipe.sr_pipeline.inside == 4           # every asset SR'd
        assert len([r for r in results if "glb" in r]) == 4
        # deterministic stub -> exact phase order per window: both
        # denoises, then ONE staging window holding both SRs, then bakes
        order = [e if isinstance(e, str) else e[0] for e in events]
        per_window = ["pre", "geo", "mv", "pre", "geo", "mv",
                      "stage_in", "sr", "sr", "stage_out", "bake", "bake"]
        assert order == per_window * 2
