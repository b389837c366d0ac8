import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.training.checkpoint import CheckpointManager
from unitex_tpu.training.data import SyntheticTextureDataset, iterate_host_sharded
from unitex_tpu.utils.logging import MetricLogger


class TestCheckpoint:
    def test_save_restore_prune(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_every=10, total_limit=2)
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        assert mgr.latest_step() is None
        assert mgr.restore_latest(tree) is None
        assert mgr.should_save(10) and not mgr.should_save(7)
        for step in (10, 20, 30):
            t = jax.tree.map(lambda x: x * step, tree)
            mgr.save(step, t)
        # pruned to the last 2
        assert mgr.latest_step() == 30
        assert not os.path.exists(mgr.path(10))
        restored = mgr.restore_latest(tree)
        np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(4.0) * 30)


class TestData:
    def test_synthetic_dataset_shapes(self):
        ds = iter(SyntheticTextureDataset(view_size=32))
        ex = next(ds)
        assert ex["target"].shape == (64, 96, 3)
        assert ex["control"].shape == (64, 96, 3)
        assert np.isfinite(ex["target"]).all()
        assert 0.0 <= ex["target"].min() and ex["target"].max() <= 1.0

    def test_host_sharding_single_host(self):
        def gen():
            i = 0
            while True:
                yield {"x": np.full((2,), i, np.float32)}
                i += 1

        it = iterate_host_sharded(gen(), global_batch=4)
        batch = next(it)
        assert batch["x"].shape == (4, 2)
        np.testing.assert_array_equal(batch["x"][:, 0], [0, 1, 2, 3])


class TestLogger:
    def test_jsonl(self, tmp_path):
        lg = MetricLogger(str(tmp_path))
        lg.log(1, {"loss": 0.5})
        lg.log(2, {"loss": 0.25, "lr": 1e-4})
        lg.close()
        lines = [json.loads(l) for l in open(lg.path)]
        assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


class TestDirectoryDataset:
    def _write_sample(self, d, with_dual=True, sr_scale=1):
        """Realistic artifact layouts: mv_normal/ccm/rgb are 2x3 grids
        (mv_rgb possibly SR-upscaled), mv_rgb_w_light is the 1x6 strip."""
        import os

        from unitex_tpu.utils.image_io import save_image

        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(0)
        for name in ("mv_normal.png", "mv_ccm.png"):
            save_image(os.path.join(d, name),
                       rng.uniform(size=(16, 24, 3)).astype(np.float32))
        save_image(os.path.join(d, "mv_rgb.png"),
                   rng.uniform(size=(16 * sr_scale, 24 * sr_scale, 3)
                               ).astype(np.float32))
        save_image(os.path.join(d, "mv_rgb_w_light.png"),
                   rng.uniform(size=(8, 48, 3)).astype(np.float32))
        if with_dual:
            save_image(os.path.join(d, "processed_image.png"),
                       rng.uniform(size=(8, 8, 3)).astype(np.float32))

    def test_texture_and_delight_modes(self, tmp_path):
        from unitex_tpu.training.data import DirectoryTextureDataset

        self._write_sample(tmp_path / "a")
        self._write_sample(tmp_path / "b" / "cache", with_dual=False,
                           sr_scale=4)

        ds = iter(DirectoryTextureDataset(str(tmp_path), mode="texture", seed=0))
        seen = [next(ds), next(ds)]
        # control grids become the 1x6 strip to match serving layout
        assert all(e["control"].shape == (8, 48, 3) for e in seen)
        assert all(e["target"].shape == (8, 48, 3) for e in seen)
        assert any("dual" in e for e in seen)       # sample a has the dual
        assert not all("dual" in e for e in seen)   # sample b has not

        # delight: target grid (even SR-upscaled) strips + resizes to the
        # control strip resolution; dual never attaches (serving has none)
        ds_d = iter(DirectoryTextureDataset(str(tmp_path), mode="delight"))
        for _ in range(2):
            e = next(ds_d)
            assert e["target"].shape == (8, 48, 3)
            assert e["control"].shape == (8, 48, 3)
            assert "dual" not in e

    def test_strip_layout_matches_pipeline(self, tmp_path):
        """Control pixel (i, j) must equal the pipeline's own
        grid_to_strip of the stored grids — the serving layout."""
        import jax.numpy as jnp

        from unitex_tpu.render.conditioning import grid_to_strip
        from unitex_tpu.training.data import DirectoryTextureDataset
        from unitex_tpu.utils.image_io import load_image
        import os

        self._write_sample(tmp_path / "a")
        ds = iter(DirectoryTextureDataset(str(tmp_path), mode="texture"))
        e = next(ds)
        base = str(tmp_path / "a")
        grid = 0.5 * load_image(os.path.join(base, "mv_normal.png")) \
            + 0.5 * load_image(os.path.join(base, "mv_ccm.png"))
        want = np.asarray(grid_to_strip(jnp.asarray(grid)))
        np.testing.assert_allclose(e["control"], want, atol=1e-6)

    def test_missing_dir_raises(self, tmp_path):
        import pytest

        from unitex_tpu.training.data import DirectoryTextureDataset

        with pytest.raises(FileNotFoundError, match="no sample dirs"):
            next(iter(DirectoryTextureDataset(str(tmp_path))))
