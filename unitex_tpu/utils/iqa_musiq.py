"""MUSIQ — Multi-Scale Image Quality transformer, from scratch in jnp.

The reference scores SR output with a pyiqa battery that includes MUSIQ
(/root/reference/TSD_SR/test/test_metrics.py:24-34, metric list line 18).
pyiqa wraps a torch port of the original model (Ke et al., ICCV 2021 —
which was itself a JAX/flax model); here the architecture is implemented
directly, matching the paper's operating point:

* multi-scale input: the native-resolution image plus aspect-ratio-
  preserving resizes with longer side 384 and 224;
* 32x32 patches, linear-projected to 384-d tokens;
* hash-based 2D spatial embedding (HSE): a learnable [G, G, D] grid
  (G=10); patch (i, j) of a [Hp, Wp] patch grid reads entry
  (floor(i*G/Hp), floor(j*G/Wp)) — this is what makes the transformer
  resolution-agnostic;
* learnable scale embedding (SCE) per scale, CLS token;
* pre-LN ViT encoder: 14 layers, 6 heads, MLP 1152;
* score head: Linear(384 -> 1) on the CLS token after the final LN.

Shapes are static per input resolution (each (H, W) traces its own jit —
fine for an eval metric that runs at one operating point).  Pretrained
weights are not bundled in this image; ``load_torch_musiq`` converts a
torch state dict (pyiqa layout) when the user supplies one.  Random-init
params exercise the full code path; the math is weight-agnostic.

Functional params: nested dicts of f32 arrays, NHWC activations.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN = 384
LAYERS = 14
HEADS = 6
MLP = 1152
PATCH = 32
GRID = 10  # HSE hash grid
SCALES = (None, 384, 224)  # native + ARP longer-side resizes


# ------------------------------------------------------------------- params


def init_musiq_params(
    key: jax.Array,
    hidden: int = HIDDEN,
    layers: int = LAYERS,
    mlp: int = MLP,
    patch: int = PATCH,
    grid: int = GRID,
    n_scales: int = len(SCALES),
) -> Dict[str, Any]:
    ks = jax.random.split(key, 4 + layers)
    patch_dim = patch * patch * 3

    def lin(k, cin, cout):
        w = jax.random.normal(k, (cin, cout), jnp.float32) / np.sqrt(cin)
        return {"kernel": w, "bias": jnp.zeros((cout,), jnp.float32)}

    def ln():
        return {
            "scale": jnp.ones((hidden,), jnp.float32),
            "bias": jnp.zeros((hidden,), jnp.float32),
        }

    blocks_list: List[Dict[str, Any]] = []
    for i in range(layers):
        ka, kb, kc, kd = jax.random.split(ks[4 + i], 4)
        blocks_list.append(
            {
                "ln1": ln(),
                "qkv": lin(ka, hidden, 3 * hidden),
                "out": lin(kb, hidden, hidden),
                "ln2": ln(),
                "fc1": lin(kc, hidden, mlp),
                "fc2": lin(kd, mlp, hidden),
            }
        )
    # stacked [L, ...] for lax.scan (depth-constant compile, repo convention)
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks_list)
    return {
        "embedding": lin(ks[0], patch_dim, hidden),
        "hse": jax.random.normal(ks[1], (grid, grid, hidden), jnp.float32) * 0.02,
        "sce": jax.random.normal(ks[2], (n_scales, hidden), jnp.float32) * 0.02,
        "cls": jnp.zeros((hidden,), jnp.float32),
        "final_ln": ln(),
        "head": lin(ks[3], hidden, 1),
        "blocks": blocks,
    }


# ------------------------------------------------------------------ encoder


def _layer_norm(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x):
    return x @ p["kernel"] + p["bias"]


def _mha(block, x, heads: int = HEADS):
    B, S, D = x.shape
    hd = D // heads
    qkv = _linear(block["qkv"], x).reshape(B, S, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, S, h, hd]
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, S, D)
    return _linear(block["out"], y)


def encode_tokens(params: Dict[str, Any], tokens: jnp.ndarray) -> jnp.ndarray:
    """Pre-LN ViT encoder over [B, S, D]; blocks stacked [L, ...] and
    lax.scan-ed.  Returns the final-LN'd sequence."""

    def body(x, block):
        x = x + _mha(block, _layer_norm(block["ln1"], x))
        h = _layer_norm(block["ln2"], x)
        h = _linear(
            block["fc2"], jax.nn.gelu(_linear(block["fc1"], h), approximate=False)
        )
        return x + h, None

    x, _ = jax.lax.scan(body, tokens, params["blocks"])
    return _layer_norm(params["final_ln"], x)


# ----------------------------------------------------------- patch pipeline


def _arp_resize(img: np.ndarray, longer: int) -> np.ndarray:
    """Host-side aspect-ratio-preserving bilinear resize (longer side ->
    ``longer``).  Resizing is preprocessing, not metric math — jax.image
    on device would work too but the grids are host-decided anyway."""
    H, W = img.shape[:2]
    if H >= W:
        h2, w2 = longer, max(1, round(W * longer / H))
    else:
        h2, w2 = max(1, round(H * longer / W)), longer
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (h2, w2, img.shape[2]), "bilinear")
    )


def _patch_tokens(
    params: Dict[str, Any], img: jnp.ndarray, scale_idx: int, patch: int = PATCH
) -> jnp.ndarray:
    """[H, W, 3] in [-1, 1] -> [Np, D] tokens with HSE + SCE added."""
    H, W, C = img.shape
    # ceil-cover the image: partial right/bottom patches are zero-padded
    # (original MUSIQ/pyiqa scores the full image; cropping would drop up
    # to patch-1 pixels per edge at every scale)
    hp, wp = -(-H // patch), -(-W // patch)
    img = jnp.pad(img, ((0, hp * patch - H), (0, wp * patch - W), (0, 0)))
    x = img.reshape(hp, patch, wp, patch, C).transpose(0, 2, 1, 3, 4)
    x = x.reshape(hp * wp, patch * patch * C)
    tok = _linear(params["embedding"], x)

    G = params["hse"].shape[0]
    gi = np.floor(np.arange(hp) * G / hp).astype(np.int32)
    gj = np.floor(np.arange(wp) * G / wp).astype(np.int32)
    hse = params["hse"][gi][:, gj]  # [hp, wp, D]
    tok = tok + hse.reshape(hp * wp, -1)
    return tok + params["sce"][scale_idx]


def musiq_tokens(params: Dict[str, Any], img: np.ndarray) -> jnp.ndarray:
    """Build the full multi-scale token sequence [1, 1+ΣNp, D] from an
    [H, W, 3] image in [0, 1] (host numpy in, device tokens out)."""
    img = np.asarray(img, np.float32) * 2.0 - 1.0
    pieces = [params["cls"][None]]
    for si, longer in enumerate(SCALES):
        view = img if longer is None else _arp_resize(img, longer)
        pieces.append(_patch_tokens(params, jnp.asarray(view), si))
    return jnp.concatenate(pieces, axis=0)[None]


def musiq(params: Dict[str, Any], img: np.ndarray) -> float:
    """MUSIQ score of one [H, W, 3] image in [0, 1]."""
    tokens = musiq_tokens(params, img)
    seq = jax.jit(encode_tokens)(params, tokens)
    return float(_linear(params["head"], seq[:, 0])[0, 0])


# ------------------------------------------------------------ torch loader


def load_torch_musiq(path: str) -> Dict[str, Any]:
    """Convert a torch MUSIQ checkpoint (pyiqa layout) to this module's
    param tree.  Components are located by shape where names drift between
    ports; encoder blocks by their sorted layer index."""
    import torch  # deserialization only

    sd = {k: v.numpy().astype(np.float32)
          for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}

    def find(shape, contains=None):
        hits = [
            k for k, v in sd.items()
            if v.shape == shape and (contains is None or contains in k)
        ]
        if len(hits) != 1:
            raise KeyError(f"need exactly one tensor of shape {shape} "
                           f"(contains={contains!r}), found {hits}")
        return sd[hits[0]]

    D, P = HIDDEN, PATCH
    params = init_musiq_params(jax.random.PRNGKey(0))
    params["embedding"] = {
        "kernel": jnp.asarray(find((D, P * P * 3)).T),
        "bias": jnp.asarray(find((D,), contains="embedding")),
    }
    params["hse"] = jnp.asarray(
        find((1, GRID * GRID, D)).reshape(GRID, GRID, D)
    )
    params["sce"] = jnp.asarray(find((len(SCALES), D)))
    params["cls"] = jnp.asarray(find((1, 1, D)).reshape(D))
    params["head"] = {
        "kernel": jnp.asarray(find((1, D)).T),
        "bias": jnp.asarray(find((1,))),
    }

    def block_keys(i):
        pref = [k for k in sd if f".{i}." in k]
        return {k.split(f".{i}.", 1)[1]: sd[k] for k in pref}

    blocks = []
    for i in range(LAYERS):
        b = block_keys(i)

        def g(frag, shape):
            hits = [k for k in b if frag in k and b[k].shape == shape]
            if len(hits) != 1:
                raise KeyError(f"block {i}: {frag} {shape} -> {hits}")
            return b[hits[0]]

        qkv_w = g("qkv", (3 * D, D)) if any(
            "qkv" in k for k in b
        ) else np.concatenate(
            [g("query", (D, D)), g("key", (D, D)), g("value", (D, D))]
        )
        qkv_b = g("qkv", (3 * D,)) if any(
            "qkv" in k and b[k].shape == (3 * D,) for k in b
        ) else np.concatenate(
            [g("query", (D,)), g("key", (D,)), g("value", (D,))]
        )
        ln_ws = sorted(
            (k for k in b if b[k].shape == (D,) and ("norm" in k or "ln" in k)
             and k.endswith("weight")),
        )
        ln_bs = [k[:-6] + "bias" for k in ln_ws]
        blocks.append(
            {
                "ln1": {"scale": jnp.asarray(b[ln_ws[0]]), "bias": jnp.asarray(b[ln_bs[0]])},
                "qkv": {"kernel": jnp.asarray(qkv_w.T), "bias": jnp.asarray(qkv_b)},
                "out": {
                    "kernel": jnp.asarray(g("out", (D, D)).T),
                    "bias": jnp.asarray(g("out", (D,))),
                },
                "ln2": {"scale": jnp.asarray(b[ln_ws[1]]), "bias": jnp.asarray(b[ln_bs[1]])},
                "fc1": {
                    "kernel": jnp.asarray(g("", (MLP, D)).T),
                    "bias": jnp.asarray(g("", (MLP,))),
                },
                "fc2": {
                    "kernel": jnp.asarray(g("", (D, MLP)).T),
                    "bias": jnp.asarray([v for k, v in b.items()
                                         if v.shape == (D,) and "bias" in k
                                         and "norm" not in k and "ln" not in k
                                         and "out" not in k][-1]),
                },
            }
        )
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    ln_w = find((D,), contains="encoder_norm.weight") if any(
        "encoder_norm" in k for k in sd
    ) else None
    if ln_w is not None:
        params["final_ln"] = {
            "scale": jnp.asarray(ln_w),
            "bias": jnp.asarray(find((D,), contains="encoder_norm.bias")),
        }
    return params


# --------------------------------------------------------- numpy reference


def encode_tokens_reference(params: Dict[str, Any], tokens: np.ndarray):
    """Plain-numpy encoder for parity tests (dual-implementation pattern,
    SURVEY.md §4)."""
    def ln(p, x, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])

    def lin(p, x):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    import math

    def gelu(x):
        erf = np.vectorize(math.erf)
        return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))

    x = np.asarray(tokens, np.float64)
    B, S, D = x.shape
    hd = D // HEADS
    stacked = params["blocks"]
    L = np.asarray(jax.tree_util.tree_leaves(stacked)[0]).shape[0]
    for i in range(L):
        blk = jax.tree.map(lambda a: np.asarray(a)[i], stacked)
        h = ln(blk["ln1"], x)
        qkv = lin(blk["qkv"], h).reshape(B, S, 3, HEADS, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        att = att - att.max(-1, keepdims=True)
        att = np.exp(att)
        att = att / att.sum(-1, keepdims=True)
        y = np.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, S, D)
        x = x + lin(blk["out"], y)
        h = ln(blk["ln2"], x)
        x = x + lin(blk["fc2"], gelu(lin(blk["fc1"], h)))
    return ln(params["final_ln"], x)
