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
