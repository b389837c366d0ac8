"""unitex_tpu — TPU-native 3D texture-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of UniTEX
(YixunLiang/UniTEX): two-stage texture synthesis for untextured meshes —
a FLUX MMDiT multi-view diffusion prior (stage 1) and a rasterization +
visibility + KNN texture baking stage (stage 2), plus an optional one-step
SD3 super-resolution stage, LoRA training, and a full geometry/render
toolkit.

Everything on the device side is functional JAX: meshes, cameras and
framebuffers are pytrees; the hot paths (rasterization, ray visibility,
KNN, flash attention) are Pallas TPU kernels with jnp reference
implementations used for parity tests; multi-chip scaling uses
jax.sharding meshes with pjit-inserted collectives over ICI.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps ``import unitex_tpu`` free of jax/device
    initialization side effects)."""
    if name == "CustomRGBTextureFullPipeline":
        from .pipeline import CustomRGBTextureFullPipeline

        return CustomRGBTextureFullPipeline
    if name == "RGBTextureFullPipeline":
        from .pipeline import RGBTextureFullPipeline

        return RGBTextureFullPipeline
    if name == "PipelineConfig":
        from .config import PipelineConfig

        return PipelineConfig
    raise AttributeError(name)
