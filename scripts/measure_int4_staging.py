"""Measure int4-packed SD3 staging vs int8 on the real chip.

The windowed --sr E2E's remaining fixed cost is the per-window SD3 weight
staging: ~2.3 GB over the ~40 MB/s host->device tunnel (~60 s/window,
10.7 s/asset at --sr-window 8, E2E_r05_sr.json).  pack_int4_tree halves
the W8A8 kernel bytes (4-bit + bf16 group-64 scales, unpacked device-side
back to the serving int8 form).  This probe measures, at production scale
(SD3-medium seed 10, the e2e_production.py tree):

  1. staged bytes + wall per staging window, int8 vs int4-packed,
  2. the one-time host pack cost,
  3. SR output deviation int4 vs int8 staging (512^2 -> 2048^2, the
     production tile config) — int4 is a lossy weight grid; the delta is
     reported against the uint8 quantization floor the output crosses
     downstream anyway.

Writes INT4_STAGING_r05.json.  Run with the TPU otherwise idle.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tree_bytes(t):
    return sum(l.nbytes for l in jax.tree.leaves(t))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="INT4_STAGING_r05.json")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
    from unitex_tpu.models.sd3.config import SD3Config
    from unitex_tpu.models.sd3.model import init_sd3_params
    from unitex_tpu.models.sd3.sr_pipeline import (TSDSRConfig, TSDSRPipeline,
                                                   _chunked_put)
    from unitex_tpu.ops.quant import pack_int4_tree, unpack_int4_tree
    from unitex_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    host = jax.devices("cpu")[0]

    s_cfg = SD3Config.sd3_medium()
    v_cfg = VAEConfig.sd3()
    print("[int4] building host trees (bf16 init + int8 quantize)...",
          flush=True)
    t0 = time.perf_counter()
    with jax.default_device(host):
        sp = init_sd3_params(jax.random.key(10), s_cfg)
        sp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), sp)
        from unitex_tpu.ops.quant import quantize_linears

        sp = quantize_linears(sp)
        vp = init_vae_params(jax.random.key(11), v_cfg)
        vp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vp)
    sp = jax.tree.map(np.asarray, sp)
    vp = jax.tree.map(np.asarray, vp)
    print(f"[int4] host build {time.perf_counter()-t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    packed = pack_int4_tree(sp, pack_bf16_wo=True)  # the shipped staged mode
    t_pack = time.perf_counter() - t0
    b8, b4, bv = tree_bytes(sp), tree_bytes(packed), tree_bytes(vp)
    print(f"[int4] pack {t_pack:.1f} s; sd3 int8 {b8/1e9:.3f} GB -> "
          f"packed {b4/1e9:.3f} GB (+ vae {bv/1e9:.3f} GB)", flush=True)

    def fence():
        np.asarray(jnp.zeros((), jnp.float32) + jnp.ones((), jnp.float32))

    unpack_jit = jax.jit(unpack_int4_tree)
    stage8, stage4 = [], []
    for r in range(args.reps):
        fence()
        t0 = time.perf_counter()
        d = _chunked_put(sp, dev)
        dv = _chunked_put(vp, dev)
        fence()
        stage8.append(time.perf_counter() - t0)
        del d, dv
        fence()
        t0 = time.perf_counter()
        d = unpack_jit(_chunked_put(packed, dev))
        dv = _chunked_put(vp, dev)
        fence()
        stage4.append(time.perf_counter() - t0)
        del d, dv
        print(f"[int4] rep {r}: int8 {stage8[-1]:.1f} s, "
              f"int4 {stage4[-1]:.1f} s", flush=True)

    report = {
        "metric": "sd3_staging_int4_vs_int8",
        "protocol": "production SD3-medium serving tree (e2e seed 10, "
                    "quantize_linears) staged host->device through the "
                    "axon tunnel; pack_int4_tree group 64 FULL packing "
                    "(pack_bf16_wo: W8A8 + bf16 linears -> int4; a "
                    "W8A8-only pack measured 3.06->2.54 GB, 17%); SR "
                    "512^2->2048^2 random-init quality delta",
        "sd3_int8_gb": round(b8 / 1e9, 3),
        "sd3_int4_gb": round(b4 / 1e9, 3),
        "vae_gb": round(bv / 1e9, 3),
        "pack_once_s": round(t_pack, 2),
        "stage_int8_s": [round(x, 2) for x in stage8],
        "stage_int4_s": [round(x, 2) for x in stage4],
        "stage_int8_median_s": round(float(np.median(stage8)), 2),
        "stage_int4_median_s": round(float(np.median(stage4)), 2),
        "complete": False,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)  # incremental: survive kills

    # quality: the production SR chain from each staged tree
    cfg = dict(vae_decode_batch=2, vae_encode_batch=2, tile_batch=2,
               vae_decoder_tile=64, host_params=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (512, 512, 3)).astype(np.float32))
    outs = {}
    for name, pack in (("int8", False), ("int4", True)):
        pipe = TSDSRPipeline(
            None, cfg=TSDSRConfig(**cfg, stage_pack_int4=pack),
            sd3_cfg=s_cfg, transformer_params=sp, vae_params=vp,
        )
        t0 = time.perf_counter()
        outs[name] = np.asarray(pipe(img))
        print(f"[int4] SR via {name} staging: {time.perf_counter()-t0:.1f} s"
              " (incl. staging + first-occurrence compiles)", flush=True)
    d = np.abs(outs["int4"].astype(np.float64) - outs["int8"].astype(np.float64))
    mse = float((d ** 2).mean())
    psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))
    u8_frac = float((np.round(outs["int4"] * 255) !=
                     np.round(outs["int8"] * 255)).mean())
    report.update({
        "sr_delta_max": round(float(d.max()), 5),
        "sr_delta_mean": round(float(d.mean()), 6),
        "sr_delta_psnr_db": round(psnr, 2),
        "sr_uint8_changed_frac": round(u8_frac, 4),
        "complete": True,
    })
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
