"""Flow-match Euler scheduler with resolution-dependent timestep shift.

Equivalent of diffusers FlowMatchEulerDiscreteScheduler as the reference
configures it (sigmas = linspace(1, 1/n, n), µ-shift from sequence length,
/root/reference/flux_piplines/texturing/pipeline.py:59-69, 594-610).
Stateless: sigma tables are plain arrays, the step is a pure function, and
the whole denoise loop can live inside ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift(mu: float, sigma: np.ndarray) -> np.ndarray:
    """exp-µ sigma warp (diffusers ``FlowMatchEulerDiscreteScheduler`` with
    use_dynamic_shifting): σ' = e^µ / (e^µ + (1/σ - 1))."""
    return math.exp(mu) / (math.exp(mu) + (1.0 / sigma - 1.0))


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerScheduler:
    """sigmas [n+1] (terminal 0 appended), timesteps [n] = sigma*1000."""

    sigmas: jnp.ndarray
    timesteps: jnp.ndarray

    @classmethod
    def create(
        cls,
        num_inference_steps: int,
        image_seq_len: int,
        base_image_seq_len: int = 256,
        max_image_seq_len: int = 4096,
        base_shift: float = 0.5,
        max_shift: float = 1.15,
    ) -> "FlowMatchEulerScheduler":
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            image_seq_len, base_image_seq_len, max_image_seq_len, base_shift, max_shift
        )
        sigmas = time_shift(mu, sigmas)
        timesteps = sigmas * 1000.0
        sigmas = np.append(sigmas, 0.0)
        return cls(
            sigmas=jnp.asarray(sigmas, jnp.float32),
            timesteps=jnp.asarray(timesteps, jnp.float32),
        )

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def step(self, model_output: jnp.ndarray, i: jnp.ndarray, sample: jnp.ndarray):
        """Euler step x_{i+1} = x_i + (σ_{i+1} − σ_i) · v  (flow matching:
        the model predicts velocity ε − x)."""
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        return sample + (sigma_next - sigma) * model_output

    def scale_noise(self, sample: jnp.ndarray, i: jnp.ndarray, noise: jnp.ndarray):
        """Forward interpolation z_t = (1−σ) x + σ ε (training,
        trainer.py:892-895)."""
        sigma = self.sigmas[i]
        return (1.0 - sigma) * sample + sigma * noise
