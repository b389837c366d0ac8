"""CLIP-IQA from scratch in jnp: CLIP RN50 image encoder + antonym prompts.

Part of the reference's pyiqa metric battery
(/root/reference/TSD_SR/test/test_metrics.py:24-34).  CLIP-IQA (Wang et
al., AAAI 2023) scores an image by the softmax over its CLIP similarity to
an antonym prompt pair ("Good photo." / "Bad photo."):

    score = softmax(100 * [cos(img, good), cos(img, bad)])[good]

The image tower is CLIP's ModifiedResNet-50 implemented here directly:

* 3-conv stem (3->32 s2, 32->32, 32->64) + blur-free avgpool(2);
* 4 bottleneck stages (3, 4, 6, 3 blocks, widths 64/128/256/512, exp 4)
  with CLIP's anti-aliased strided path (avgpool before the 1x1 conv3 and
  in the downsample branch);
* attention pooling: mean token as query, 32-head attention over the
  7x7(+1) grid with a learned positional embedding, projected to 1024-d.

Arbitrary input sizes are handled the way pyiqa's port does it: the 7x7
spatial positional embedding is bilinearly resized to the actual H/32 x
W/32 grid.  BatchNorms run in inference form (folded running stats).

The text tower is NOT reimplemented: the two prompt features are constants
of the metric.  ``clip_text_features`` computes them once with the HF
``transformers`` CLIP text encoder (torch-cpu, available in this image for
deserialization) and they ride along in the params npz; at inference only
the jnp image tower runs.

Functional params: nested dicts of f32 arrays, conv kernels HWIO, NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STAGES = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)
EXP = 4
EMBED = 2048       # stem_width(64) * 32
OUT_DIM = 1024
POOL_HEADS = 32
SPACIAL = 7        # attnpool grid for 224x224 training inputs

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

DEFAULT_PROMPTS = ("Good photo.", "Bad photo.")


# ------------------------------------------------------------------- params


def _conv_p(key, k, cin, cout):
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32)
    return {"kernel": w * np.sqrt(2.0 / (k * k * cin))}


def _bn_p(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_clipiqa_params(key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {
        "conv1": _conv_p(next(ks), 3, 3, 32), "bn1": _bn_p(32),
        "conv2": _conv_p(next(ks), 3, 32, 32), "bn2": _bn_p(32),
        "conv3": _conv_p(next(ks), 3, 32, 64), "bn3": _bn_p(64),
    }
    cin = 64
    for si, (n, width) in enumerate(zip(STAGES, WIDTHS)):
        blocks = []
        for bi in range(n):
            stride = 2 if (bi == 0 and si > 0) else 1
            blk = {
                "conv1": _conv_p(next(ks), 1, cin, width), "bn1": _bn_p(width),
                "conv2": _conv_p(next(ks), 3, width, width), "bn2": _bn_p(width),
                "conv3": _conv_p(next(ks), 1, width, width * EXP),
                "bn3": _bn_p(width * EXP),
            }
            if stride != 1 or cin != width * EXP:
                blk["down_conv"] = _conv_p(next(ks), 1, cin, width * EXP)
                blk["down_bn"] = _bn_p(width * EXP)
            blocks.append(blk)
            cin = width * EXP
        p[f"layer{si + 1}"] = blocks
    D = EMBED
    p["attnpool"] = {
        "pos": jax.random.normal(next(ks), (SPACIAL * SPACIAL + 1, D)) / np.sqrt(D),
        "q": {"kernel": jax.random.normal(next(ks), (D, D)) / np.sqrt(D),
              "bias": jnp.zeros((D,))},
        "k": {"kernel": jax.random.normal(next(ks), (D, D)) / np.sqrt(D),
              "bias": jnp.zeros((D,))},
        "v": {"kernel": jax.random.normal(next(ks), (D, D)) / np.sqrt(D),
              "bias": jnp.zeros((D,))},
        "c": {"kernel": jax.random.normal(next(ks), (D, OUT_DIM)) / np.sqrt(D),
              "bias": jnp.zeros((OUT_DIM,))},
    }
    # prompt-pair text features [2, OUT_DIM] (unit-normalized); random until
    # the user converts a real checkpoint
    t = jax.random.normal(next(ks), (2, OUT_DIM), jnp.float32)
    p["text_features"] = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    return p


# ------------------------------------------------------------------ forward


def _conv(p, x, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x, eps=1e-5):
    inv = p["scale"] / jnp.sqrt(p["var"] + eps)
    return x * inv + (p["bias"] - p["mean"] * inv)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _bottleneck(blk, x, stride: int):
    """``stride`` is static (2 on the first block of stages 2-4): strides
    are architecture facts, not weights, so they stay out of the traced
    param tree."""
    out = jax.nn.relu(_bn(blk["bn1"], _conv(blk["conv1"], x)))
    out = jax.nn.relu(_bn(blk["bn2"], _conv(blk["conv2"], out, pad=1)))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(blk["bn3"], _conv(blk["conv3"], out))
    if "down_conv" in blk:
        idn = x if stride == 1 else _avg_pool(x, stride)
        idn = _bn(blk["down_bn"], _conv(blk["down_conv"], idn))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def _attnpool(p, x):
    """x [B, H, W, EMBED] -> [B, OUT_DIM] (mean-query attention pool)."""
    B, H, W, D = x.shape
    tok = x.reshape(B, H * W, D)
    tok = jnp.concatenate([tok.mean(axis=1, keepdims=True), tok], axis=1)
    pos = p["pos"]
    if H * W + 1 != pos.shape[0]:
        side = int(np.sqrt(pos.shape[0] - 1))
        # F.interpolate(bilinear, align_corners=False) semantics: half-pixel
        # centers, no antialias (matches the torch port's resizing)
        grid = jax.image.resize(
            pos[1:].reshape(side, side, D), (H, W, D), "bilinear",
            antialias=False,
        ).reshape(H * W, D)
        pos = jnp.concatenate([pos[:1], grid], axis=0)
    tok = tok + pos[None]

    hd = D // POOL_HEADS
    q = (tok[:, :1] @ p["q"]["kernel"] + p["q"]["bias"]).reshape(B, 1, POOL_HEADS, hd)
    k = (tok @ p["k"]["kernel"] + p["k"]["bias"]).reshape(B, -1, POOL_HEADS, hd)
    v = (tok @ p["v"]["kernel"] + p["v"]["bias"]).reshape(B, -1, POOL_HEADS, hd)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, 1, D)
    return (y @ p["c"]["kernel"] + p["c"]["bias"])[:, 0]


def encode_image(params: Dict[str, Any], img: jnp.ndarray) -> jnp.ndarray:
    """img [B, H, W, 3] in [0, 1] -> unit-normalized CLIP features
    [B, OUT_DIM].  H, W must be multiples of 32."""
    x = (img - _CLIP_MEAN) / _CLIP_STD
    x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x, stride=2, pad=1)))
    x = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], x, pad=1)))
    x = jax.nn.relu(_bn(params["bn3"], _conv(params["conv3"], x, pad=1)))
    x = _avg_pool(x, 2)
    for si in range(4):
        for bi, blk in enumerate(params[f"layer{si + 1}"]):
            x = _bottleneck(blk, x, stride=2 if (bi == 0 and si > 0) else 1)
    f = _attnpool(params["attnpool"], x)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def clipiqa(params: Dict[str, Any], img: np.ndarray) -> float:
    """CLIP-IQA score in [0, 1] of one [H, W, 3] image in [0, 1]
    (higher = better).  The image is cropped to a multiple of 32."""
    H, W = img.shape[:2]
    img = img[: H // 32 * 32, : W // 32 * 32]
    feats = jax.jit(encode_image)(params, jnp.asarray(img, jnp.float32)[None])
    logits = 100.0 * feats @ params["text_features"].T  # [1, 2]
    return float(jax.nn.softmax(logits, axis=-1)[0, 0])


# ------------------------------------------------------------ torch loaders


def _torch_conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}


def _torch_bn(sd, name):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32)),
        "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"], np.float32)),
        "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"], np.float32)),
    }


def load_torch_clip_rn50(path: str, prefix: str = "visual.") -> Dict[str, Any]:
    """Convert an OpenAI-CLIP RN50 state dict (``visual.*`` tree: conv1-3 /
    bn1-3 stem, layer1-4 bottlenecks, attnpool {q,k,v,c}_proj +
    positional_embedding) into this module's params.  Text features must be
    attached separately (``clip_text_features`` or a precomputed npz)."""
    import torch  # deserialization only

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    sd = {k[len(prefix):]: v.numpy() for k, v in raw.items() if k.startswith(prefix)}

    p = init_clipiqa_params(jax.random.PRNGKey(0))
    for i in (1, 2, 3):
        p[f"conv{i}"] = _torch_conv(sd, f"conv{i}")
        p[f"bn{i}"] = _torch_bn(sd, f"bn{i}")
    for si in range(4):
        blocks = []
        bi = 0
        while f"layer{si + 1}.{bi}.conv1.weight" in sd:
            base = f"layer{si + 1}.{bi}"
            blk = {
                "conv1": _torch_conv(sd, f"{base}.conv1"),
                "bn1": _torch_bn(sd, f"{base}.bn1"),
                "conv2": _torch_conv(sd, f"{base}.conv2"),
                "bn2": _torch_bn(sd, f"{base}.bn2"),
                "conv3": _torch_conv(sd, f"{base}.conv3"),
                "bn3": _torch_bn(sd, f"{base}.bn3"),
            }
            # CLIP stores the strided shortcut as downsample.{0=avgpool,1=conv,2=bn}
            if f"{base}.downsample.1.weight" in sd:
                blk["down_conv"] = _torch_conv(sd, f"{base}.downsample.1")
                blk["down_bn"] = _torch_bn(sd, f"{base}.downsample.2")
            elif f"{base}.downsample.0.weight" in sd:
                blk["down_conv"] = _torch_conv(sd, f"{base}.downsample.0")
                blk["down_bn"] = _torch_bn(sd, f"{base}.downsample.1")
            blocks.append(blk)
            bi += 1
        p[f"layer{si + 1}"] = blocks

    ap = "attnpool."

    def lin(name, transpose=True):
        w = np.asarray(sd[f"{ap}{name}.weight"], np.float32)
        return {
            "kernel": jnp.asarray(w.T if transpose else w),
            "bias": jnp.asarray(np.asarray(sd[f"{ap}{name}.bias"], np.float32)),
        }

    p["attnpool"] = {
        "pos": jnp.asarray(np.asarray(sd[f"{ap}positional_embedding"], np.float32)),
        "q": lin("q_proj"), "k": lin("k_proj"), "v": lin("v_proj"),
        "c": lin("c_proj"),
    }
    return p


def clip_text_features(
    model_dir: str, prompts: Sequence[str] = DEFAULT_PROMPTS
) -> np.ndarray:
    """Unit-normalized prompt features [N, OUT_DIM] via the HF transformers
    CLIP text tower (host torch-cpu; run once, cache in the params)."""
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(model_dir)
    proc = CLIPProcessor.from_pretrained(model_dir)
    with torch.no_grad():
        toks = proc(text=list(prompts), return_tensors="pt", padding=True)
        f = model.get_text_features(**toks)
        f = f / f.norm(dim=-1, keepdim=True)
    return f.numpy().astype(np.float32)


# --------------------------------------------------------- numpy reference


def encode_image_reference(params: Dict[str, Any], img: np.ndarray) -> np.ndarray:
    """Plain-numpy image tower for parity tests (dual-implementation
    pattern, SURVEY.md §4).  Small inputs only — im2col convs."""
    def conv(p, x, stride=1, pad=0):
        w = np.asarray(p["kernel"], np.float64)
        N, H, W, _ = x.shape
        k = w.shape[0]
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        Ho = (H + 2 * pad - k) // stride + 1
        Wo = (W + 2 * pad - k) // stride + 1
        out = np.empty((N, Ho, Wo, w.shape[-1]))
        for i in range(Ho):
            for j in range(Wo):
                patch = xp[:, i * stride: i * stride + k, j * stride: j * stride + k]
                out[:, i, j] = patch.reshape(N, -1) @ w.reshape(-1, w.shape[-1])
        return out

    def bn(p, x, eps=1e-5):
        inv = np.asarray(p["scale"]) / np.sqrt(np.asarray(p["var"]) + eps)
        return x * inv + (np.asarray(p["bias"]) - np.asarray(p["mean"]) * inv)

    def pool(x, k):
        N, H, W, C = x.shape
        return x[:, : H // k * k, : W // k * k].reshape(
            N, H // k, k, W // k, k, C
        ).mean(axis=(2, 4))

    relu = lambda v: np.maximum(v, 0.0)
    x = (np.asarray(img, np.float64) - _CLIP_MEAN) / _CLIP_STD
    x = relu(bn(params["bn1"], conv(params["conv1"], x, 2, 1)))
    x = relu(bn(params["bn2"], conv(params["conv2"], x, 1, 1)))
    x = relu(bn(params["bn3"], conv(params["conv3"], x, 1, 1)))
    x = pool(x, 2)
    for si in range(4):
        for bi, blk in enumerate(params[f"layer{si + 1}"]):
            stride = 2 if (bi == 0 and si > 0) else 1
            out = relu(bn(blk["bn1"], conv(blk["conv1"], x)))
            out = relu(bn(blk["bn2"], conv(blk["conv2"], out, 1, 1)))
            if stride > 1:
                out = pool(out, stride)
            out = bn(blk["bn3"], conv(blk["conv3"], out))
            if "down_conv" in blk:
                idn = x if stride == 1 else pool(x, stride)
                idn = bn(blk["down_bn"], conv(blk["down_conv"], idn))
            else:
                idn = x
            x = relu(out + idn)

    ap = params["attnpool"]
    B, H, W, D = x.shape
    tok = x.reshape(B, H * W, D)
    tok = np.concatenate([tok.mean(1, keepdims=True), tok], axis=1)
    pos = np.asarray(ap["pos"], np.float64)
    if pos.shape[0] != H * W + 1:
        raise ValueError("reference path expects the native 7x7 grid")
    tok = tok + pos[None]
    hd = D // POOL_HEADS
    lin = lambda p, t: t @ np.asarray(p["kernel"], np.float64) + np.asarray(p["bias"])
    q = lin(ap["q"], tok[:, :1]).reshape(B, 1, POOL_HEADS, hd)
    k = lin(ap["k"], tok).reshape(B, -1, POOL_HEADS, hd)
    v = lin(ap["v"], tok).reshape(B, -1, POOL_HEADS, hd)
    att = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    y = np.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, 1, D)
    f = lin(ap["c"], y)[:, 0]
    return f / np.linalg.norm(f, axis=-1, keepdims=True)
