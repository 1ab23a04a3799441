"""wdno_tpu: TPU-native wavelet diffusion neural operator framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of WDNO
(Wavelet Diffusion Neural Operator, ICLR 2025): diffusion models in
wavelet-coefficient space for generative PDE simulation and control, with
zero-shot super-resolution via a conditioned refinement model.
"""

__version__ = "0.1.0"
