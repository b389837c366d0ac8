"""Golden SELF-parity harness (BASELINE.md protocol).

Reference goldens cannot be produced in this environment (no CUDA, no
weights), so the numeric-drift bounds for the production config are
asserted against the framework itself: the weightless pipeline runs under
each serving-mode axis — shape bucketing on/off, int8 serving on/off, and
a 1-virtual-device process vs this 8-device one — and every image artifact
is scored by scripts/compare_golden.compare_caches with PSNR floors.
Reference analogue: the bundled test cases of /root/reference/run.py:5
(seed 63) scored by texture PSNR."""

import os
import subprocess
import sys
import dataclasses

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from compare_golden import compare_caches  # noqa: E402

from unitex_tpu.config import (
    BakeConfig,
    CameraConfig,
    MeshConfig,
    PipelineConfig,
)
from unitex_tpu.geometry.io.mesh_io import save_mesh
from unitex_tpu.geometry.primitives import make_icosphere
from unitex_tpu.pipeline import CustomRGBTextureFullPipeline

REPO = os.path.join(os.path.dirname(__file__), "..")


def small_config(shape_bucket: int = 4096) -> PipelineConfig:
    return PipelineConfig(
        camera=CameraConfig(view_size=64),
        mesh=MeshConfig(
            min_faces=500, max_faces=4000, uv_size=256,
            shape_bucket=shape_bucket,
        ),
        bake=BakeConfig(uv_size=256),
    )


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    mesh_path = str(d / "input.glb")
    save_mesh(mesh_path, make_icosphere(3))
    img = np.full((256, 256, 3), 255, np.uint8)
    img[64:192, 64:192] = [200, 60, 30]
    img_path = str(d / "image.png")
    Image.fromarray(img).save(img_path)
    return mesh_path, img_path


@pytest.fixture(scope="module")
def baseline_cache(assets, tmp_path_factory):
    """One weightless production-config (bucketing on, bf16) run."""
    mesh_path, img_path = assets
    out = str(tmp_path_factory.mktemp("base"))
    pipe = CustomRGBTextureFullPipeline(
        pretrain_models=None, seed=63, config=small_config()
    )
    pipe(out, img_path, mesh_path)
    return os.path.join(out, "cache")


class TestGoldenSelfParity:
    def test_bucketing_drift_bounded(self, assets, baseline_cache, tmp_path):
        """Shape bucketing pads with degenerate faces the rasterizers cull;
        its numeric drift on every artifact must stay far above the 35 dB
        production floor."""
        mesh_path, img_path = assets
        out = str(tmp_path / "nobucket")
        pipe = CustomRGBTextureFullPipeline(
            pretrain_models=None, seed=63, config=small_config(shape_bucket=0)
        )
        pipe(out, img_path, mesh_path)
        report = compare_caches(os.path.join(out, "cache"), baseline_cache)
        scored = [v for v in report["artifacts"].values() if v]
        assert len(scored) >= 6, report
        assert report["worst_psnr"] >= 35.0, report

    def test_int8_serving_mode_identical_weightless(
        self, assets, baseline_cache, tmp_path
    ):
        """int8 serving touches only the FLUX kernels; the geometry+bake
        path must be bit-identical (infinite PSNR) with it toggled."""
        mesh_path, img_path = assets
        out = str(tmp_path / "int8")
        pipe = CustomRGBTextureFullPipeline(
            pretrain_models=None, seed=63, config=small_config(),
            int8_serving=True,
        )
        pipe(out, img_path, mesh_path)
        report = compare_caches(os.path.join(out, "cache"), baseline_cache)
        # utils.metrics.psnr caps identical images at 120 dB
        assert report["worst_psnr"] >= 120.0, report

    def test_one_device_process_drift_bounded(
        self, assets, baseline_cache, tmp_path
    ):
        """The same job in a 1-virtual-device process: device count must
        not change the artifacts beyond reduction-order noise."""
        mesh_path, img_path = assets
        out = str(tmp_path / "dev1")
        driver = (
            "import os\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "os.environ['XLA_FLAGS'] = "
            "'--xla_force_host_platform_device_count=1'\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert jax.device_count() == 1\n"
            f"import sys; sys.path.insert(0, {REPO!r}); "
            f"sys.path.insert(0, {os.path.join(REPO, 'tests')!r})\n"
            "from test_golden_parity import small_config\n"
            "from unitex_tpu.pipeline import CustomRGBTextureFullPipeline\n"
            "pipe = CustomRGBTextureFullPipeline(pretrain_models=None, "
            "seed=63, config=small_config())\n"
            f"pipe({out!r}, {img_path!r}, {mesh_path!r})\n"
        )
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        subprocess.run(
            [sys.executable, "-c", driver], check=True, env=env, timeout=900,
        )
        report = compare_caches(os.path.join(out, "cache"), baseline_cache)
        scored = [v for v in report["artifacts"].values() if v]
        assert len(scored) >= 6, report
        assert report["worst_psnr"] >= 35.0, report
