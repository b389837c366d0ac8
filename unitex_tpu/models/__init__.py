"""Model families: FLUX MMDiT (stage-1 diffusion prior), SD3 MMDiT
(TSD-SR), LTM texture-function VAE, classic SR archs, text encoders."""
