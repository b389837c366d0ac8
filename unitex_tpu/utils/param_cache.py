"""Disk cache for (quantized) serving parameter trees.

The TPU analog of the reference's prequantized-NF4 checkpoint branch
(reference pipeline.py:74-96 loads `flux_transformer_nf4` directly instead
of quantizing at startup): quantize ONCE offline, then every serving
process loads the final int8/bf16 tree straight from disk.  Measured
motivation: building the 12B serving tree from scratch (host random-init /
safetensors load -> bf16 cast -> int8 quantization) costs ~45 min of
single-core host time in the E2E harness; the cached tree is a single
sequential file read.

Format: one ``.npz`` (uncompressed — the int8 payload doesn't compress
meaningfully and decompression would be single-core bound) holding the
flattened leaves as ``a0..aN`` plus a ``__paths__`` JSON index.  bfloat16
leaves (no stable numpy serialization) are stored as their uint16 bit
pattern and restored by view.  Writes are atomic (tmp + rename) so a
killed process never leaves a torn cache.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict

import numpy as np

__all__ = ["save_params", "load_params", "load_meta"]

_BF16_TAG = "bfloat16"


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k in sorted(tree):
            assert "/" not in str(k), f"param key {k!r} contains '/'"
            # '#'-prefixed keys are the list-node encoding (_listify):
            # a dict key starting with '#' would silently round-trip as a
            # list (ADVICE r03)
            assert not str(k).startswith("#"), (
                f"param key {k!r} starts with '#' (reserved for list nodes)"
            )
            _flatten(tree[k], f"{prefix}/{k}" if prefix else str(k), out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/#{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def _insert(tree: Dict[str, Any], path: str, leaf: Any) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = leaf


def _listify(tree: Any) -> Any:
    """Convert '#i'-keyed dicts back into lists."""
    if not isinstance(tree, dict):
        return tree
    if tree and all(k.startswith("#") for k in tree):
        return [
            _listify(tree[f"#{i}"]) for i in range(len(tree))
        ]
    return {k: _listify(v) for k, v in tree.items()}


def save_params(path: str, params: Any, meta: Any = None) -> None:
    """Atomically write a nested dict/list tree of arrays to ``path``.

    ``meta`` (JSON-serializable) is stored alongside the leaves as a
    ``__meta__`` entry — a cache fingerprint (quantizer version, source
    checkpoint identity, …) the caller verifies on load so a stale or
    mismatched tree is never silently served (ADVICE r03)."""
    leaves: Dict[str, np.ndarray] = {}
    _flatten(params, "", leaves)
    payload: Dict[str, np.ndarray] = {}
    index = []
    for i, (p, a) in enumerate(leaves.items()):
        dt = str(a.dtype)
        if dt == _BF16_TAG:
            a = a.view(np.uint16)
        payload[f"a{i}"] = a
        index.append([p, dt])
    payload["__paths__"] = np.frombuffer(
        json.dumps(index).encode(), dtype=np.uint8
    )
    if meta is not None:
        payload["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_params(path: str) -> Any:
    """Load a tree written by :func:`save_params` (numpy host arrays)."""
    import ml_dtypes

    with np.load(path) as z:
        index = json.loads(bytes(z["__paths__"]).decode())
        tree: Dict[str, Any] = {}
        for i, (p, dt) in enumerate(index):
            a = z[f"a{i}"]
            if dt == _BF16_TAG:
                a = a.view(ml_dtypes.bfloat16)
            _insert(tree, p, a)
    return _listify(tree)


def load_meta(path: str) -> Any:
    """Return the ``meta`` stored by :func:`save_params`, or None (legacy
    caches written before the fingerprint existed have no ``__meta__``)."""
    with np.load(path) as z:
        if "__meta__" not in z.files:
            return None
        return json.loads(bytes(z["__meta__"]).decode())
