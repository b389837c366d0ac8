from .config import FluxConfig
from .model import init_flux_params, flux_forward
from .scheduler import FlowMatchEulerScheduler, calculate_shift
from .vae import VAEConfig, init_vae_params, vae_encode, vae_decode
