"""Product entry point — the reference's 10-line run.py equivalent
(/root/reference/run.py:1-11): one image + one mesh -> textured GLB."""

import argparse

from unitex_tpu.pipeline import CustomRGBTextureFullPipeline


def main():
    ap = argparse.ArgumentParser(description="UniTEX-TPU texture generation")
    ap.add_argument("--image", required=True, help="reference RGB image")
    ap.add_argument("--mesh", required=True, help="untextured mesh (obj/ply/glb)")
    ap.add_argument("--out", default="output", help="output directory")
    ap.add_argument("--pretrain-models", default=None,
                    help="checkpoint root (flux/{transformer,vae} + LoRAs)")
    ap.add_argument("--seed", type=int, default=63)
    ap.add_argument("--super-resolution", action="store_true")
    # the reference's step_2_ablition always exports the 120-frame orbit
    # turntable (/root/reference/pipeline.py:624-632); the single-shot CLI
    # matches that default, opt out with --no-export-video (batch serving
    # drivers keep it off — it costs seconds per asset)
    ap.add_argument("--export-video", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--int8", dest="int8", action="store_const", const=True,
                    default=False, help="W8A8 int8 serving (fastest)")
    ap.add_argument("--int8-max-memory", dest="int8",
                    action="store_const", const="max_memory",
                    help="int8 + weight-only storage: the 12B transformer "
                         "fits one 16 GB chip")
    ap.add_argument("--fast-steps", type=int, default=0,
                    help="denoise steps served by velocity extrapolation "
                         "instead of a transformer evaluation (training-"
                         "free speedup; 0 = the exact 28-step schedule). "
                         "CAVEAT: the quality table (VELOCITY_REUSE_r03."
                         "json, 48.3/47.5/40.5 dB at 4/8/12) was measured "
                         "on a RANDOM-INIT transformer — re-run scripts/"
                         "eval_velocity_reuse.py before relying on it "
                         "with trained weights")
    args = ap.parse_args()

    import dataclasses

    from unitex_tpu.config import DEFAULT_CONFIG

    config = DEFAULT_CONFIG
    if args.fast_steps:
        config = dataclasses.replace(
            config,
            diffusion=dataclasses.replace(
                config.diffusion, velocity_reuse=args.fast_steps
            ),
        )

    pipeline = CustomRGBTextureFullPipeline(
        pretrain_models=args.pretrain_models,
        super_resolutions=args.super_resolution,
        seed=args.seed,
        int8_serving=args.int8,
        config=config,
    )
    rembg_png, textured_glb = pipeline(
        args.out, args.image, args.mesh, export_video=args.export_video
    )
    print(f"wrote {rembg_png}\nwrote {textured_glb}")


if __name__ == "__main__":
    main()
