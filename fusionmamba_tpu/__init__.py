"""fusionmamba_tpu: TPU-native multimodal image fusion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
FusionMamba reference (see SURVEY.md): dual-encoder VMamba (SS2D) fusion
network, cross-modal dynamic feature enhancement, fusion-driven semantic
segmentation, selective-scan Pallas kernels, and GSPMD sharding.
"""

__version__ = "0.1.0"
