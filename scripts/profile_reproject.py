"""Stage-level profile of the serving reproject path at production scale.

VERDICT r02 #5: the reproject stage is ~6.3 s of the 6.5 s asset time and
nobody has shown it is at the roofline.  This breaks it into its jitted
programs — mv_render, uv_render, _visibility_paste, the bake tail — times
each warm (median of 3, host-fenced via a scalar reduction transfer; plain
block_until_ready does not fence through the remote-exec tunnel), and
prints a bytes-moved accounting per program so the measured time can be
compared against the chip's ~800 GB/s HBM roofline.

  python scripts/profile_reproject.py [--faces-bucket 32768]
      [--uv-size 2048] [--view-size 512] [--out PROFILE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor an explicit platform request (cpu smoke runs) — but do NOT lock
# the platform list to the sitecustomize's "axon" value: that would hide
# the host cpu backend these drivers stage GB-scale inits on
if os.environ.get("JAX_PLATFORMS") and os.environ["JAX_PLATFORMS"] != "axon":
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def fence(x):
    """Host-fence device work: scalar reduction + transfer."""
    import jax.numpy as jnp

    leaves = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")]
    return float(sum(jnp.sum(v.astype(jnp.float32)) for v in leaves[:1]))


def timed(fn, n=3):
    fence(fn())  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--view-size", type=int, default=512)
    ap.add_argument("--uv-size", type=int, default=2048)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unitex_tpu.geometry.mesh import Mesh, pad_mesh_to_bucket
    from unitex_tpu.geometry.primitives import make_trefoil
    from unitex_tpu.geometry.uv_atlas import unwrap_atlas
    from unitex_tpu.render.conditioning import condition_cameras
    from unitex_tpu.render.renderer_inverse import (
        _finish_reproject_blur,
        _visibility_paste,
        mv_render,
        uv_render,
    )
    from unitex_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    host = make_trefoil(n_major=384, n_minor=40)
    host = unwrap_atlas(host, size=args.uv_size, gutter=4)
    mesh = Mesh(
        jnp.asarray(host.vertices * 0.85),
        jnp.asarray(host.faces),
        uv=jnp.asarray(host.uv),
        faces_uv=jnp.asarray(host.faces_uv),
    )
    mesh = pad_mesh_to_bucket(mesh, 4096)
    c2ws, intr = condition_cameras()
    V = (args.view_size, args.view_size)
    U = args.uv_size
    M = c2ws.shape[0]
    views = jnp.asarray(
        np.random.default_rng(0).random((M, V[0], V[1], 3)), jnp.float32
    )

    t_mv = timed(lambda: mv_render(mesh, c2ws, intr, V))
    t_uv = timed(lambda: uv_render(mesh, U))
    mv_out = jax.tree.map(lambda x: x, mv_render(mesh, c2ws, intr, V))
    uv_out = uv_render(mesh, U)
    maskv = mv_out["mask"] & mv_out["mask_visible"]

    def vis_paste():
        return _visibility_paste(
            uv_out["position"], uv_out["mask"], uv_out["tri"],
            uv_out["face_normal"],
            mv_out["mvp"], mv_out["w2cs"], c2ws, mv_out["depth"],
            mv_out["tri"], maskv, views,
            perspective=False, ray_normal_angle_threshold=100.0,
            depth_eps=5e-3, visibility_mode="depth", ring_kernels=(3, 5),
            priority=(0, 3, 4, 1, 2, 5), kernel_size_boundary=3,
            kernel_size_boundary_blur=3,
        )

    t_vis = timed(vis_paste)
    color_cur, mask_cur, boundary, visible_any, _ = vis_paste()

    def tail():
        return _finish_reproject_blur(
            uv_out, color_cur, mask_cur, boundary, visible_any,
            method="lens", kernel_size_blur=5, knn_max_ref=65536,
            knn_chunk=4096, query_field=None,
        )["texture"]

    t_tail = timed(tail)

    F = int(mesh.faces.shape[0])
    Vt = int(mesh.vertices.shape[0])
    # bytes-moved accounting (f32, one ideal pass per tensor)
    acct = {
        "mv_render": {
            # binned raster: faces setup + per-tile z-test traffic +
            # interpolate/normal/depth chains writing 6 full buffers
            "out_buffers_GB": round(M * V[0] * V[1] * (1 + 1 + 3 + 3 + 1 + 1) * 4 / 1e9, 3),
            "faces": F, "verts": Vt,
        },
        "uv_render": {
            "out_buffers_GB": round(U * U * (1 + 3 + 3 + 1) * 4 / 1e9, 3),
        },
        "visibility_paste": {
            # per view: project 4 reads of pos_h + bilinear 4-tap gather of
            # 5 planes + ring-close window ops on [M, U, U]
            "gather_GB": round(M * U * U * 5 * 4 * 4 / 1e9, 3),
            "window_ops_GB": round(M * U * U * 4 * 2 * 8 / 1e9, 3),
            "paste_GB": round(U * U * (3 + 1) * 4 * M / 1e9, 3),
        },
        "tail": {"texture_GB": round(U * U * 3 * 4 * 3 / 1e9, 3)},
    }
    report = {
        "metric": "reproject_stage_profile",
        "faces_bucketed": F,
        "uv_size": U,
        "view_size": args.view_size,
        "t_mv_render_s": round(t_mv, 3),
        "t_uv_render_s": round(t_uv, 3),
        "t_visibility_paste_s": round(t_vis, 3),
        "t_bake_tail_s": round(t_tail, 3),
        "t_total_s": round(t_mv + t_uv + t_vis + t_tail, 3),
        "traffic_accounting": acct,
        "hbm_roofline_GBps": 819,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
