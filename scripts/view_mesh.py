#!/usr/bin/env python
"""Interactive mesh viewer server (renderer_gradio.py capability):
drag-to-orbit rendering of a mesh in the browser, rendered server-side
through the unitex_tpu renderer.

  python scripts/view_mesh.py path/to/mesh.glb --port 7860 [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from unitex_tpu.render.viewer import serve
    serve(args.mesh, port=args.port, host=args.host)


if __name__ == "__main__":
    main()
