"""jepa_tpu: a TPU-native (JAX / XLA / Pallas / pjit) V-JEPA framework.

Self-supervised video pretraining via masked latent feature prediction
(multiblock-3D masking, narrow transformer predictor, EMA target encoder,
L1 latent loss) plus frozen-backbone attentive-probe evaluations, built
TPU-first: one fused pjit train step over a device mesh, static shapes,
on-device mask generation and augmentation, Pallas flash attention.

Capability surface mirrors facebookresearch/jepa (see SURVEY.md); the
implementation is a ground-up JAX design, not a port.
"""

__version__ = "0.1.0"
