import jax.numpy as jnp
import numpy as np

from unitex_tpu.image.color_transfer import (
    color_transfer_mk,
    color_transfer_quantile,
    masks_to_boxes,
)


def test_mk_matches_stats():
    rng = np.random.default_rng(0)
    src = rng.normal([0.3, 0.5, 0.7], 0.1, (1000, 3)).astype(np.float32)
    tgt = rng.normal([0.7, 0.2, 0.4], [0.2, 0.05, 0.1], (1000, 3)).astype(np.float32)
    out = np.asarray(color_transfer_mk(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(out.mean(0), tgt.mean(0), atol=0.02)
    np.testing.assert_allclose(out.std(0), tgt.std(0), atol=0.02)


def test_quantile_exact_distribution():
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    tgt = rng.uniform(2, 3, (500, 3)).astype(np.float32)
    out = color_transfer_quantile(src, tgt)
    # output values are drawn exactly from the target's set
    assert np.isin(np.round(out[:, 0], 5), np.round(tgt[:, 0], 5)).all()
    # order preserved per channel
    o = np.argsort(src[:, 1])
    assert (np.diff(out[o, 1]) >= 0).all()


def test_masks_to_boxes():
    m = np.zeros((2, 8, 10), bool)
    m[0, 2:5, 3:7] = True
    boxes = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_array_equal(boxes[0], [3, 2, 6, 4])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


class TestSlicedOT:
    def _np_ctsot(self, src, dst, dirs):
        """Direct numpy port of the reference solver loop (no filter)."""
        new_src = src.reshape(-1, src.shape[-1]).copy()
        d2 = dst.reshape(-1, dst.shape[-1])
        for step_dirs in dirs:
            advect = np.zeros_like(new_src)
            for d in step_dirs:
                ps = new_src @ d
                pt = d2 @ d
                ids, idt = np.argsort(ps), np.argsort(pt)
                a = pt[idt] - ps[ids]
                advect[ids] += a[:, None] * d
            new_src += advect / len(step_dirs)
        return new_src.reshape(src.shape)

    def test_matches_numpy_reference(self):
        import jax

        from unitex_tpu.image.color_transfer import color_transfer_sliced_ot

        rng = np.random.default_rng(0)
        src = rng.uniform(size=(12, 12, 3)).astype(np.float32)
        dst = (rng.uniform(size=(12, 12, 3)) * 0.5 + 0.25).astype(np.float32)
        key = jax.random.PRNGKey(0)
        out = np.asarray(
            color_transfer_sliced_ot(
                jnp.asarray(src), jnp.asarray(dst), key=key,
                steps=4, batch_size=3, reg_sigma_xy=0.0,
            )
        )
        dirs = np.asarray(
            jax.random.normal(key, (4, 3, 3), jnp.float32)
        )
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        ref = self._np_ctsot(src, dst, dirs)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_transfers_distribution(self):
        from unitex_tpu.image.color_transfer import color_transfer_sliced_ot

        rng = np.random.default_rng(1)
        src = rng.normal(0.3, 0.05, size=(16, 16, 3)).astype(np.float32)
        dst = rng.normal(0.7, 0.1, size=(16, 16, 3)).astype(np.float32)
        out = np.asarray(
            color_transfer_sliced_ot(
                jnp.asarray(src), jnp.asarray(dst),
                steps=12, batch_size=6, reg_sigma_xy=0.0,
            )
        )
        assert abs(out.mean() - dst.mean()) < 0.02
        assert abs(out.std() - dst.std()) < 0.03

    def test_target_size_mismatch(self):
        from unitex_tpu.image.color_transfer import color_transfer_sliced_ot

        rng = np.random.default_rng(2)
        src = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        dst = rng.uniform(size=(20, 4, 3)).astype(np.float32)
        out = color_transfer_sliced_ot(
            jnp.asarray(src), jnp.asarray(dst), steps=2, reg_sigma_xy=0.0
        )
        assert out.shape == (8, 8, 3)


class TestBilateral:
    def test_constant_unchanged(self):
        from unitex_tpu.image.color_transfer import bilateral_filter

        img = jnp.full((16, 16, 3), 0.3)
        out = np.asarray(bilateral_filter(img, 5.0, 2.0, radius=3))
        np.testing.assert_allclose(out, 0.3, atol=1e-6)

    def test_edge_preserving(self):
        from unitex_tpu.image.color_transfer import bilateral_filter
        from unitex_tpu.ops.image_ops import gaussian_blur

        img = np.zeros((16, 16, 1), np.float32)
        img[:, 8:] = 1.0
        noisy = img + np.random.default_rng(0).normal(
            0, 0.02, img.shape
        ).astype(np.float32)
        out = np.asarray(
            bilateral_filter(jnp.asarray(noisy), sigma_v=0.1, sigma_xy=2.0, radius=3)
        )
        gs = np.asarray(gaussian_blur(jnp.asarray(noisy), k=7, sigma=2.0))
        # bilateral keeps the step much sharper than gaussian
        edge_b = abs(out[:, 8] - out[:, 7]).mean()
        edge_g = abs(gs[:, 8] - gs[:, 7]).mean()
        assert edge_b > 3 * edge_g
        # and denoises the flat regions
        assert out[:, :5].std() < noisy[:, :5].std()
