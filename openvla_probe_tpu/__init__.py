"""openvla_probe_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language-action framework.

From-scratch re-design of the capabilities of the OpenVLA + Prismatic-VLM + linear-probe
stack (reference: helenlu66/openvla-probe): fused image preprocessing, dual-ViT
(DINOv2 + SigLIP) vision backbones, Llama-2 language backbone, discrete 256-bin action
decoding, on-device hidden-state capture for linear probing, RLDS/Open-X data loading,
and pjit/shard_map distributed training over TPU device meshes.

Compute path is JAX/XLA with Pallas TPU kernels for the hot ops; the host runtime
(data pipeline, serving, probe analysis) is Python + C-accelerated deps.
"""

__version__ = "0.1.0"
