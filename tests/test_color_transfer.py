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
