"""FID InceptionV3 feature extractor (basicsr/archs/inception.py parity):
feature-block shapes, the TF count-excluding average-pool patch, and the
pytorch-fid checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.models import inception as inc
from unitex_tpu.utils.metrics import activation_statistics, frechet_distance

rng = np.random.default_rng(0)


class TestAvgPoolExclude:
    def test_corner_uses_4_cells(self):
        """At the corner, the TF-compat pool divides by the 4 valid cells,
        not 9 (the FID patch vs torch count_include_pad)."""
        x = jnp.ones((1, 4, 4, 1))
        out = inc._avg_pool3_exclude(x)
        np.testing.assert_allclose(float(out[0, 0, 0, 0]), 1.0, atol=1e-6)
        # include-pad pooling would give 4/9 at the corner
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0))) / 9.0
        assert abs(float(s[0, 0, 0, 0]) - 4.0 / 9.0) < 1e-6

    def test_interior_matches_mean(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 5, 2))
        out = inc._avg_pool3_exclude(x)
        expect = jnp.mean(x[0, 1:4, 1:4], axis=(0, 1))
        np.testing.assert_allclose(np.asarray(out[0, 2, 2]),
                                   np.asarray(expect), atol=1e-6)


class TestInception:
    def test_feature_block_shapes(self):
        """Canonical InceptionV3 pyramid at the 299^2 input: 73^2x64,
        35^2x192, 17^2x768, 1x1x2048 (inception.py:22-30)."""
        p = inc.init_fid_inception_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        feats = inc.fid_inception_features(p, x, output_blocks=(0, 1, 2, 3))
        assert feats[0].shape == (1, 73, 73, 64)
        assert feats[1].shape == (1, 35, 35, 192)
        assert feats[2].shape == (1, 17, 17, 768)
        assert feats[3].shape == (1, 1, 1, 2048)
        assert all(bool(jnp.isfinite(f).all()) for f in feats)

    def test_no_resize_runs_at_native_size(self):
        p = inc.init_fid_inception_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
        (f,) = inc.fid_inception_features(p, x, resize_input=False)
        assert f.shape == (2, 1, 1, 2048)

    def test_converter_structure(self):
        """Synthetic pytorch-fid state dict (torchvision key names) must
        convert to the init tree's exact structure."""
        init = inc.init_fid_inception_params(jax.random.PRNGKey(0))
        sd = {}
        for block, sub in init.items():
            if "kernel" in sub:            # plain BasicConv2d
                sub = {None: sub}
            for br, bc in sub.items():
                name = block if br is None else f"{block}.{br}"
                kh, kw, cin, cout = bc["kernel"].shape
                sd[f"{name}.conv.weight"] = rng.normal(
                    size=(cout, cin, kh, kw)).astype(np.float32) * 0.05
                sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
                sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
                sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
                sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
        sd["fc.weight"] = np.zeros((1008, 2048), np.float32)  # ignored
        p = inc.convert_fid_inception(sd)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        assert all(a.shape == b.shape for a, b in zip(ps, qs))

    def test_fid_pipeline(self):
        """End-to-end: features -> activation statistics -> Frechet
        distance; identical sets give ~0, disjoint sets give > 0."""
        p = inc.init_fid_inception_params(jax.random.PRNGKey(0))
        a = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 3)) ** 2.0
        fa = np.asarray(inc.fid_inception_features(p, a)[0]).reshape(4, -1)
        fb = np.asarray(inc.fid_inception_features(p, b)[0]).reshape(4, -1)
        mu_a, s_a = activation_statistics(fa)
        mu_b, s_b = activation_statistics(fb)
        d_aa = frechet_distance(mu_a, s_a, mu_a, s_a)
        d_ab = frechet_distance(mu_a, s_a, mu_b, s_b)
        # random-init features are sparse post-relu: assert ordering, not a
        # magnitude threshold (real weights give meaningful magnitudes)
        assert d_aa < 1e-6
        assert np.isfinite(d_ab) and d_ab > d_aa
