"""Optical-flow IO round trips (basicsr/utils/flow_util.py semantics)."""

import numpy as np
import pytest

from unitex_tpu.utils.flow_io import (
    dequantize, dequantize_flow, flow_pair_read, flow_pair_write,
    flowread, flowwrite, quantize, quantize_flow,
)


def test_flo_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.normal(0, 3, size=(17, 23, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flowwrite(flow, p)
    back = flowread(p)
    np.testing.assert_array_equal(back, flow)


def test_flo_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"XXXX" + b"\0" * 16)
    with pytest.raises(IOError):
        flowread(str(p))


def test_quantize_dequantize_bin_centers():
    arr = np.linspace(-1.0, 1.0, 101)
    q = quantize(arr, -1.0, 1.0, 255)
    assert q.min() >= 0 and q.max() <= 254
    dq = dequantize(q, -1.0, 1.0, 255)
    # worst-case error is half a bin width
    assert np.abs(dq - arr).max() <= (2.0 / 255) * 0.5 + 1e-12
    # reference behavior: zero maps back to ~zero (bin-center convention)
    assert abs(dequantize(quantize(np.zeros(1), -1, 1, 255), -1, 1, 255)[0]) < 2.0 / 255


def test_quantize_validates():
    with pytest.raises(ValueError):
        quantize(np.zeros(3), 0.0, 1.0, 1)
    with pytest.raises(ValueError):
        quantize(np.zeros(3), 1.0, 0.0, 255)
    with pytest.raises(ValueError):
        dequantize(np.zeros(3), 1.0, 0.0, 255)


def test_quantized_flow_round_trip():
    rng = np.random.default_rng(1)
    h, w = 20, 30
    # keep within +-max_val*dim so the clip is lossless
    flow = rng.uniform(-0.015, 0.015, size=(h, w, 2)).astype(np.float32)
    flow[..., 0] *= w
    flow[..., 1] *= h
    dx, dy = quantize_flow(flow, max_val=0.02, norm=True)
    assert dx.dtype == np.uint8 and dy.dtype == np.uint8
    back = dequantize_flow(dx, dy, max_val=0.02, denorm=True)
    # bin width after denorm: 0.04/255 * dim
    assert np.abs(back[..., 0] - flow[..., 0]).max() <= 0.04 / 255 * w
    assert np.abs(back[..., 1] - flow[..., 1]).max() <= 0.04 / 255 * h


@pytest.mark.parametrize("axis", [0, 1])
def test_flow_pair_concat_form(axis):
    rng = np.random.default_rng(2)
    flow = rng.uniform(-0.3, 0.3, size=(12, 16, 2)).astype(np.float32)
    cat = flow_pair_write(flow, concat_axis=axis)
    assert cat.dtype == np.uint8
    assert cat.shape[axis] == flow.shape[axis] * 2
    back = flow_pair_read(cat, concat_axis=axis)
    assert back.shape == flow.shape
    assert np.abs(back - flow).max() < 0.1


def test_flow_pair_read_validates():
    with pytest.raises(IOError):
        flow_pair_read(np.zeros((4, 4, 2), np.uint8))
