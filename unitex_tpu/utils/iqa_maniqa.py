"""MANIQA from scratch in jnp — multi-dimension attention NR-IQA.

Part of the reference's pyiqa metric battery
(/root/reference/TSD_SR/test/test_metrics.py:24-34).  MANIQA (Yang et
al., CVPRW 2022, NTIRE'22 winner) scores a 224x224 crop:

* ViT-B/8 backbone; the patch-token outputs (CLS dropped) of encoder
  blocks 6-9 are channel-concatenated -> [28*28, 4*768];
* stage 1: 2 transposed attention blocks (TABlock — attention ACROSS
  channels, the q/k/v linears act on the 784-d spatial axis), 1x1 conv to
  768, 2 windowed swin blocks (window 4, shifted on the second);
* stage 2: same shape with width 384;
* dual head: per-token score branch and sigmoid weight branch; the final
  score is the weight-averaged token score.

At test time the official protocol averages several random 224 crops; here
``maniqa`` averages a deterministic 5-crop (corners + center) so scores
are reproducible.

Pretrained weights are not bundled in this image — ``load_torch_maniqa``
converts the official checkpoint when supplied.  Random-init params
exercise the full code path (the math is weight-agnostic).  The swin
blocks reuse the repo's shifted-window attention approach
(models/swinir.py) in miniature.

Functional params: nested dicts of f32 arrays, NHWC activations.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMG = 224
PATCH = 8
TOKENS = (IMG // PATCH) ** 2          # 784
SIDE = IMG // PATCH                   # 28
VIT_DIM = 768
VIT_LAYERS = 12
VIT_HEADS = 12
VIT_MLP = 3072
TAP_BLOCKS = (6, 7, 8, 9)             # official extract_feature indices
WINDOW = 4
S1_DIM, S2_DIM = 768, 384
SWIN_HEADS = 4
SWIN_MLP = 768


# ------------------------------------------------------------------- params


def _lin_p(key, cin, cout):
    w = jax.random.normal(key, (cin, cout), jnp.float32) / np.sqrt(cin)
    return {"kernel": w, "bias": jnp.zeros((cout,), jnp.float32)}


def _ln_p(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_vit_params(key: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(key, VIT_LAYERS + 3)
    blocks_list = []
    for i in range(VIT_LAYERS):
        ka, kb, kc, kd = jax.random.split(ks[i], 4)
        blocks_list.append({
            "ln1": _ln_p(VIT_DIM),
            "qkv": _lin_p(ka, VIT_DIM, 3 * VIT_DIM),
            "out": _lin_p(kb, VIT_DIM, VIT_DIM),
            "ln2": _ln_p(VIT_DIM),
            "fc1": _lin_p(kc, VIT_DIM, VIT_MLP),
            "fc2": _lin_p(kd, VIT_MLP, VIT_DIM),
        })
    # stacked [L, ...] for lax.scan (depth-constant compile, repo convention)
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks_list)
    kp = ks[VIT_LAYERS]
    patch_w = jax.random.normal(
        kp, (PATCH, PATCH, 3, VIT_DIM), jnp.float32
    ) / np.sqrt(PATCH * PATCH * 3)
    return {
        "patch": {"kernel": patch_w, "bias": jnp.zeros((VIT_DIM,), jnp.float32)},
        "cls": jnp.zeros((VIT_DIM,), jnp.float32),
        "pos": jax.random.normal(ks[VIT_LAYERS + 1], (TOKENS + 1, VIT_DIM)) * 0.02,
        "blocks": blocks,
    }


def _swin_block_p(key, dim):
    ka, kb, kc, kd = jax.random.split(key, 4)
    nw = 2 * WINDOW - 1
    return {
        "ln1": _ln_p(dim),
        "qkv": _lin_p(ka, dim, 3 * dim),
        "out": _lin_p(kb, dim, dim),
        "rpb": jnp.zeros((nw * nw, SWIN_HEADS), jnp.float32),
        "ln2": _ln_p(dim),
        "fc1": _lin_p(kc, dim, SWIN_MLP),
        "fc2": _lin_p(kd, SWIN_MLP, dim),
    }


def init_maniqa_params(key: jax.Array) -> Dict[str, Any]:
    kv, k1, k2, k3, k4, k5, k6, k7, k8, k9, ka, kb = jax.random.split(key, 12)
    return {
        "vit": init_vit_params(kv),
        "tab1": [
            {"q": _lin_p(k1, TOKENS, TOKENS), "k": _lin_p(k2, TOKENS, TOKENS),
             "v": _lin_p(k3, TOKENS, TOKENS)},
            {"q": _lin_p(k4, TOKENS, TOKENS), "k": _lin_p(k5, TOKENS, TOKENS),
             "v": _lin_p(k6, TOKENS, TOKENS)},
        ],
        "conv1": _lin_p(k7, 4 * VIT_DIM, S1_DIM),      # 1x1 conv == linear
        "swin1": [
            _swin_block_p(jax.random.fold_in(k8, 0), S1_DIM),
            _swin_block_p(jax.random.fold_in(k8, 1), S1_DIM),
        ],
        "tab2": [
            {"q": _lin_p(jax.random.fold_in(k9, i * 3), TOKENS, TOKENS),
             "k": _lin_p(jax.random.fold_in(k9, i * 3 + 1), TOKENS, TOKENS),
             "v": _lin_p(jax.random.fold_in(k9, i * 3 + 2), TOKENS, TOKENS)}
            for i in range(2)
        ],
        "conv2": _lin_p(ka, S1_DIM, S2_DIM),
        "swin2": [
            _swin_block_p(jax.random.fold_in(kb, 0), S2_DIM),
            _swin_block_p(jax.random.fold_in(kb, 1), S2_DIM),
        ],
        "fc_score": [
            _lin_p(jax.random.fold_in(kb, 2), S2_DIM, S2_DIM),
            _lin_p(jax.random.fold_in(kb, 3), S2_DIM, 1),
        ],
        "fc_weight": [
            _lin_p(jax.random.fold_in(kb, 4), S2_DIM, S2_DIM),
            _lin_p(jax.random.fold_in(kb, 5), S2_DIM, 1),
        ],
    }


# ---------------------------------------------------------------- backbone


def _layer_norm(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x):
    return x @ p["kernel"] + p["bias"]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def vit_tap_features(params: Dict[str, Any], img: jnp.ndarray) -> jnp.ndarray:
    """img [B, 224, 224, 3] (ImageNet-normalized) -> [B, 784, 4*768]:
    channel-concat of the patch tokens after blocks ``TAP_BLOCKS``."""
    p = params["vit"]
    x = jax.lax.conv_general_dilated(
        img, p["patch"]["kernel"], (PATCH, PATCH), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch"]["bias"]
    B = x.shape[0]
    x = x.reshape(B, TOKENS, VIT_DIM)
    x = jnp.concatenate([jnp.broadcast_to(p["cls"], (B, 1, VIT_DIM)), x], axis=1)
    x = x + p["pos"][None]

    def body(x, blk):
        h = _layer_norm(blk["ln1"], x)
        B_, S, D = h.shape
        hd = D // VIT_HEADS
        qkv = _linear(blk["qkv"], h).reshape(B_, S, 3, VIT_HEADS, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd), axis=-1
        )
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B_, S, D)
        x = x + _linear(blk["out"], y)
        h = _layer_norm(blk["ln2"], x)
        x = x + _linear(blk["fc2"], _gelu(_linear(blk["fc1"], h)))
        return x, x

    _, ys = jax.lax.scan(body, x, p["blocks"])       # [L, B, S, D]
    taps = [ys[i, :, 1:] for i in TAP_BLOCKS]        # drop CLS per tap
    return jnp.concatenate(taps, axis=-1)


# ------------------------------------------------------------------- stages


def tab_block(p, x):
    """Transposed attention: x [B, C, N] — q/k/v linears over the spatial
    axis N, attention matrix is C x C (channels attend to channels)."""
    q = _linear(p["q"], x)
    k = _linear(p["k"], x)
    v = _linear(p["v"], x)
    att = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * (x.shape[-1] ** -0.5), -1)
    return att @ v + x


def _window_partition(x, H, W, win):
    B = x.shape[0]
    x = x.reshape(B, H // win, win, W // win, win, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, x.shape[-1])


def _window_merge(w, H, W, win, B):
    x = w.reshape(B, H // win, W // win, win, win, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * W, -1)


def _rpb_index(win):
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :] + win - 1
    return rel[0] * (2 * win - 1) + rel[1]  # [win², win²]


_RPB_IDX = _rpb_index(WINDOW)


def _shift_mask(H: int, W: int, w: int, s: int) -> np.ndarray:
    """[nW, w², w²] additive mask (0 / -100) keeping shifted-window
    attention within pre-roll regions (standard swin; same construction as
    models/swinir.py)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def swin_block(p, x, shift: int = 0, H=SIDE, W=SIDE):
    """One windowed-attention block over tokens x [B, N, C]; ``shift`` is a
    static python int (blocks alternate 0 / WINDOW//2)."""
    B, N, C = x.shape
    h = _layer_norm(p["ln1"], x).reshape(B, H, W, C)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    wtok = _window_partition(h.reshape(B, H * W, C), H, W, WINDOW)
    nW, L, _ = wtok.shape
    hd = C // SWIN_HEADS
    qkv = _linear(p["qkv"], wtok).reshape(nW, L, 3, SWIN_HEADS, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = jnp.einsum("wqhd,wkhd->whqk", q, k) / np.sqrt(hd)
    att = att + p["rpb"][jnp.asarray(_RPB_IDX)].transpose(2, 0, 1)[None]
    if shift:
        m = jnp.asarray(_shift_mask(H, W, WINDOW, shift))  # [nw, L, L]
        att = att.reshape(B, nW // B, SWIN_HEADS, L, L) + m[None, :, None]
        att = att.reshape(nW, SWIN_HEADS, L, L)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("whqk,wkhd->wqhd", att, v).reshape(nW, L, C)
    y = _linear(p["out"], y)
    y = _window_merge(y, H, W, WINDOW, B).reshape(B, H, W, C)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = x + y.reshape(B, N, C)
    h = _layer_norm(p["ln2"], x)
    return x + _linear(p["fc2"], _gelu(_linear(p["fc1"], h)))


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def maniqa_forward(params: Dict[str, Any], img: jnp.ndarray) -> jnp.ndarray:
    """img [B, 224, 224, 3] in [0, 1] -> score [B]."""
    x = (img - _IMAGENET_MEAN) / _IMAGENET_STD
    feat = vit_tap_features(params, x)                 # [B, N, 4*768]
    h = feat.transpose(0, 2, 1)                        # [B, C, N]
    for tp in params["tab1"]:
        h = tab_block(tp, h)
    h = _linear(params["conv1"], h.transpose(0, 2, 1))  # [B, N, 768]
    for i, sp in enumerate(params["swin1"]):
        h = swin_block(sp, h, shift=(WINDOW // 2 if i % 2 else 0))
    h2 = h.transpose(0, 2, 1)
    for tp in params["tab2"]:
        h2 = tab_block(tp, h2)
    h = _linear(params["conv2"], h2.transpose(0, 2, 1))  # [B, N, 384]
    for i, sp in enumerate(params["swin2"]):
        h = swin_block(sp, h, shift=(WINDOW // 2 if i % 2 else 0))
    s = jax.nn.relu(_linear(params["fc_score"][0], h))
    s = jax.nn.relu(_linear(params["fc_score"][1], s))[..., 0]       # [B, N]
    w = jax.nn.relu(_linear(params["fc_weight"][0], h))
    w = jax.nn.sigmoid(_linear(params["fc_weight"][1], w))[..., 0]   # [B, N]
    return jnp.sum(s * w, axis=1) / (jnp.sum(w, axis=1) + 1e-8)


def maniqa(params: Dict[str, Any], img: np.ndarray) -> float:
    """MANIQA score of one [H, W, 3] image in [0, 1]: deterministic 5-crop
    (4 corners + center, 224²; smaller images are resized up) average."""
    img = np.asarray(img, np.float32)
    H, W = img.shape[:2]
    if H < IMG or W < IMG:
        img = np.asarray(jax.image.resize(
            jnp.asarray(img), (max(H, IMG), max(W, IMG), 3), "bilinear"))
        H, W = img.shape[:2]
    offs = [(0, 0), (0, W - IMG), (H - IMG, 0), (H - IMG, W - IMG),
            ((H - IMG) // 2, (W - IMG) // 2)]
    crops = np.stack([img[i: i + IMG, j: j + IMG] for i, j in offs])
    scores = jax.jit(maniqa_forward)(params, jnp.asarray(crops))
    return float(jnp.mean(scores))


# ------------------------------------------------------------ torch loader


def load_torch_maniqa(path: str, vit_path: str | None = None) -> Dict[str, Any]:
    """Convert the official MANIQA checkpoint (and, if the checkpoint does
    not embed it, a timm vit_base_patch8_224 state dict) to this module's
    tree.  Linear weights transpose [out,in]->[in,out]; the timm patch-proj
    conv OIHW->HWIO."""
    import torch  # deserialization only

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if hasattr(v, "__array__") or hasattr(v, "numpy")}

    params = init_maniqa_params(jax.random.PRNGKey(0))

    def lin(name):
        return {"kernel": jnp.asarray(sd[f"{name}.weight"].T),
                "bias": jnp.asarray(sd[f"{name}.bias"])}

    def conv1x1(name):
        w = sd[f"{name}.weight"]  # [out, in, 1, 1]
        return {"kernel": jnp.asarray(w[:, :, 0, 0].T),
                "bias": jnp.asarray(sd[f"{name}.bias"])}

    vit_sd = sd
    if not any(k.startswith("vit.") for k in sd):
        if vit_path is None:
            raise KeyError("checkpoint has no vit.* keys; pass vit_path")
        vit_sd = {f"vit.{k}": np.asarray(v, np.float32) for k, v in
                  torch.load(vit_path, map_location="cpu", weights_only=True).items()}

    v = params["vit"]
    pw = vit_sd["vit.patch_embed.proj.weight"]  # OIHW
    v["patch"] = {"kernel": jnp.asarray(np.transpose(pw, (2, 3, 1, 0))),
                  "bias": jnp.asarray(vit_sd["vit.patch_embed.proj.bias"])}
    v["cls"] = jnp.asarray(vit_sd["vit.cls_token"].reshape(-1))
    v["pos"] = jnp.asarray(vit_sd["vit.pos_embed"][0])
    blocks_list = []
    for i in range(VIT_LAYERS):
        b = f"vit.blocks.{i}"
        blocks_list.append({
            "ln1": {"scale": jnp.asarray(vit_sd[f"{b}.norm1.weight"]),
                    "bias": jnp.asarray(vit_sd[f"{b}.norm1.bias"])},
            "qkv": {"kernel": jnp.asarray(vit_sd[f"{b}.attn.qkv.weight"].T),
                    "bias": jnp.asarray(vit_sd[f"{b}.attn.qkv.bias"])},
            "out": {"kernel": jnp.asarray(vit_sd[f"{b}.attn.proj.weight"].T),
                    "bias": jnp.asarray(vit_sd[f"{b}.attn.proj.bias"])},
            "ln2": {"scale": jnp.asarray(vit_sd[f"{b}.norm2.weight"]),
                    "bias": jnp.asarray(vit_sd[f"{b}.norm2.bias"])},
            "fc1": {"kernel": jnp.asarray(vit_sd[f"{b}.mlp.fc1.weight"].T),
                    "bias": jnp.asarray(vit_sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(vit_sd[f"{b}.mlp.fc2.weight"].T),
                    "bias": jnp.asarray(vit_sd[f"{b}.mlp.fc2.bias"])},
        })
    v["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks_list)

    for tname in ("tab1", "tab2"):
        tkey = {"tab1": "tablock1", "tab2": "tablock2"}[tname]
        for i in range(2):
            params[tname][i] = {
                "q": lin(f"{tkey}.{i}.c_q"),
                "k": lin(f"{tkey}.{i}.c_k"),
                "v": lin(f"{tkey}.{i}.c_v"),
            }
    params["conv1"] = conv1x1("conv1")
    params["conv2"] = conv1x1("conv2")
    for sname, prefix, dim in (("swin1", "swintransformer1", S1_DIM),
                               ("swin2", "swintransformer2", S2_DIM)):
        keys = sorted({k.split(".weight")[0] for k in sd
                       if k.startswith(prefix) and "qkv" in k and k.endswith("weight")})
        for i, qk in enumerate(keys[:2]):
            base = qk.rsplit(".qkv", 1)[0]
            blk = params[sname][i]
            blk["qkv"] = lin(f"{base}.qkv")
            blk["out"] = lin(f"{base}.proj")
            rpb = [k for k in sd if k.startswith(base) and "relative_position_bias" in k
                   and k.endswith("table")]
            if rpb:
                blk["rpb"] = jnp.asarray(sd[rpb[0]])
            ln_base = base.rsplit(".", 1)[0]
            for j, nm in ((1, "norm1"), (2, "norm2")):
                key = f"{base.rsplit('.attn', 1)[0]}.{nm}" if ".attn" in base else f"{ln_base}.{nm}"
                if f"{key}.weight" in sd:
                    blk[f"ln{j}"] = {"scale": jnp.asarray(sd[f"{key}.weight"]),
                                     "bias": jnp.asarray(sd[f"{key}.bias"])}
            mlp_base = base.rsplit(".attn", 1)[0] if ".attn" in base else ln_base
            if f"{mlp_base}.mlp.fc1.weight" in sd:
                blk["fc1"] = lin(f"{mlp_base}.mlp.fc1")
                blk["fc2"] = lin(f"{mlp_base}.mlp.fc2")
    for hname, hkey in (("fc_score", "fc_score"), ("fc_weight", "fc_weight")):
        lkeys = sorted(k.split(".weight")[0] for k in sd
                       if k.startswith(hkey) and k.endswith(".weight"))
        params[hname] = [lin(k) for k in lkeys[:2]]
    return params


# --------------------------------------------------------- numpy reference


def tab_block_reference(p: Dict[str, Any], x: np.ndarray) -> np.ndarray:
    """Plain-numpy TABlock for parity tests."""
    lin = lambda q, t: t @ np.asarray(q["kernel"], np.float64) + np.asarray(q["bias"])
    q, k, v = lin(p["q"], x), lin(p["k"], x), lin(p["v"], x)
    att = q @ k.transpose(0, 2, 1) * (x.shape[-1] ** -0.5)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    return att @ v + x
