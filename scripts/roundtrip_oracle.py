"""Texture round-trip oracle CLI — the reference's de-facto correctness
check, promoted to a tool (renderer_inverse.py test_gt/test_pred:732-827:
render a ground-truth-textured mesh into the 6 box views, re-bake the
texture from those views, compare).

  python scripts/roundtrip_oracle.py [--mesh m.glb | --primitive sphere]
      [--texture t.png] [--view-size 512] [--uv-size 2048]
      [--method reproject|kdtree|reproject_blending] [--out report.json]

Without --texture a smooth procedural function of 3D position is baked as
ground truth.  Prints one JSON line: masked texture PSNR over texels that
are visible from at least one view, plus per-view re-render PSNR.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None, help="obj/ply/glb (unwrapped if needed)")
    ap.add_argument("--primitive", default="sphere",
                    choices=["sphere", "torus", "trefoil", "compound"])
    ap.add_argument("--subdiv", type=int, default=5, help="sphere subdivisions")
    ap.add_argument("--texture", default=None, help="ground-truth texture PNG")
    ap.add_argument("--view-size", type=int, default=512)
    ap.add_argument("--uv-size", type=int, default=2048)
    ap.add_argument("--method", default="reproject",
                    choices=["reproject", "kdtree", "reproject_blending"])
    ap.add_argument("--paste-mode", default="priority",
                    choices=["priority", "cosine"],
                    help="reproject paste: reference fixed view order, or "
                         "per-texel best-cosine view (renderer_inverse.py "
                         "_paste_views)")
    ap.add_argument("--fill-k", type=int, default=1,
                    help="invisible-texel KNN fill neighbors (k>1 = IDW)")
    ap.add_argument("--fill-relax", type=int, default=0,
                    help="seam-aware Jacobi relaxation iters on the fill")
    ap.add_argument("--out", default=None, help="also write the report here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unitex_tpu.geometry.mesh import Mesh
    from unitex_tpu.geometry.primitives import (
        make_icosphere,
        make_torus,
        make_trefoil,
    )
    from unitex_tpu.geometry.uv_atlas import unwrap_atlas
    from unitex_tpu.render.conditioning import condition_cameras
    from unitex_tpu.render.renderer import render_views
    from unitex_tpu.render.renderer_inverse import bake_texture, uv_render
    from unitex_tpu.utils import enable_compilation_cache
    from unitex_tpu.utils.timer import CPUTimer

    enable_compilation_cache()

    if args.mesh:
        from unitex_tpu.geometry.io.mesh_io import load_mesh
        from unitex_tpu.geometry.uv_atlas import preprocess_blank_mesh

        host = preprocess_blank_mesh(load_mesh(args.mesh), uv_size=args.uv_size)
    else:
        from unitex_tpu.geometry.primitives import make_compound

        host = {
            "sphere": lambda: make_icosphere(args.subdiv),
            "torus": lambda: make_torus(n_major=192, n_minor=128),
            "trefoil": lambda: make_trefoil(n_major=384, n_minor=40),
            "compound": lambda: make_compound(subdivisions=5),
        }[args.primitive]()
        host = unwrap_atlas(host, size=args.uv_size, gutter=4)
    mesh = Mesh(
        jnp.asarray(host.vertices * 0.85),
        jnp.asarray(host.faces),
        uv=jnp.asarray(host.uv),
        faces_uv=jnp.asarray(host.faces_uv),
    )

    uv_out = uv_render(mesh, args.uv_size)
    if args.texture:
        from unitex_tpu.utils.image_io import load_image

        tex = jnp.asarray(load_image(args.texture))
        if tex.shape[:2] != (args.uv_size, args.uv_size):
            tex = jax.image.resize(
                tex, (args.uv_size, args.uv_size, 3), "bilinear")
        tex = jnp.where(uv_out["mask"], tex, 0.0)
    else:
        tex = jnp.where(
            uv_out["mask"], 0.5 + 0.5 * uv_out["position"] / 0.85, 0.0)

    # GT views render from a pull_push-dilated texture: the gutter
    # convention of the baked output (zero gutters darken seam pixels in
    # both the bake's inputs and the re-render comparison — measured
    # +10 dB trefoil re-render; see oracle_campaign.py)
    from unitex_tpu.ops.image_ops import pull_push

    tex_render = pull_push(tex, uv_out["mask"])
    c2ws, intr = condition_cameras()
    V = (args.view_size, args.view_size)
    with CPUTimer("render_gt_views"):
        out = render_views(
            mesh, c2ws, intr, V, map_attr=tex_render,
            render_uv=True, render_map_attr=True,
        )
        views = np.asarray(out.map_attr)
    bake_kwargs = {}
    if args.method == "reproject":
        bake_kwargs = dict(
            paste_mode=args.paste_mode, fill_k=args.fill_k,
            fill_relax_iters=args.fill_relax,
        )
    with CPUTimer("bake"):
        baked = bake_texture(
            mesh, jnp.asarray(views), c2ws, intr,
            uv_size=args.uv_size, method=args.method, **bake_kwargs,
        )
        rec = np.asarray(baked["texture"])

    mask = np.asarray(uv_out["mask"])[..., 0]
    vis_any = np.asarray(baked["mask_visible_any"])[..., 0]
    ok = mask & vis_any

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(-10 * np.log10(max(mse, 1e-10)), 2)

    tex_np = np.asarray(tex)
    report = {
        "metric": "texture_roundtrip",
        "method": args.method,
        **bake_kwargs,
        "faces": int(mesh.faces.shape[0]),
        "uv_size": args.uv_size,
        "view_size": args.view_size,
        "visible_texel_fraction": round(float(vis_any[mask].mean()), 4),
        "texture_psnr_visible": psnr(rec[ok], tex_np[ok]),
    }
    with CPUTimer("rerender"):
        out2 = render_views(
            mesh, c2ws, intr, V, map_attr=jnp.asarray(rec),
            render_uv=True, render_map_attr=True,
        )
        views2 = np.asarray(out2.map_attr)
        alpha = np.asarray(out.alpha) > 0.5
        report["rerender_psnr"] = psnr(views2[alpha[..., 0]], views[alpha[..., 0]])
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
