#!/usr/bin/env python
"""Texture-generation HTTP service: load the pipeline once, serve
(image, mesh) -> textured-GLB jobs over a stdlib HTTP API with host/device
pipelining (unitex_tpu/serving.py).  Example:

    python scripts/serve_pipeline.py --port 8080 --pretrain-models ckpts/
    curl -X POST localhost:8080/jobs -d '{"image_path": "x.png",
                                          "mesh_path": "m.glb"}'
    curl localhost:8080/jobs/<id>            # poll status
    curl -o out.glb localhost:8080/jobs/<id>/result
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--work-dir", default="serve_jobs")
    ap.add_argument("--pretrain-models", default=None)
    ap.add_argument("--seed", type=int, default=63)
    ap.add_argument("--super-resolution", action="store_true")
    ap.add_argument("--int8", dest="int8", action="store_const", const=True,
                    default=False, help="W8A8 int8 serving (fastest)")
    ap.add_argument("--int8-max-memory", dest="int8",
                    action="store_const", const="max_memory",
                    help="int8 + weight-only storage (12B on one 16 GB chip)")
    ap.add_argument("--small", action="store_true",
                    help="reduced resolutions (smoke tests / CPU)")
    ap.add_argument("--no-prefetch", action="store_true")
    ap.add_argument("--prewarm", action="store_true",
                    help="load/compile the default-bucket executables on "
                         "the device worker before the first job (a fresh "
                         "process otherwise spends minutes of cached-"
                         "executable loads inside job 1)")
    args = ap.parse_args()

    from unitex_tpu.pipeline import CustomRGBTextureFullPipeline
    from unitex_tpu.serving import serve

    config = None
    if args.small:
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, MeshConfig, PipelineConfig,
        )

        config = PipelineConfig(
            camera=CameraConfig(view_size=64),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=256),
            bake=BakeConfig(uv_size=256),
        )

    kwargs = {"config": config} if config is not None else {}
    pipe = CustomRGBTextureFullPipeline(
        pretrain_models=args.pretrain_models,
        super_resolutions=args.super_resolution,
        seed=args.seed,
        int8_serving=args.int8,
        **kwargs,
    )
    httpd = serve(
        pipe, args.work_dir, port=args.port, host=args.host,
        prefetch=not args.no_prefetch, prewarm=args.prewarm,
    )
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(work dir {args.work_dir})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.jobs.stop()
        httpd.server_close()


if __name__ == "__main__":
    main()
