"""OneProt-TPU: a TPU-native multi-modal protein foundation-model framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
klemens-floege/oneprot (mounted read-only at /root/reference): contrastive
alignment of per-modality protein encoders (structure tokens, residue graphs,
binding pockets, biomedical text, MSA, sequence-similarity triplets) to a
frozen ESM2 sequence anchor, in the ImageBind/CLIP style.

Key design departures from the reference (CUDA/torch/Lightning):
  - one jit-compiled train step per (modality, length-bucket) instead of the
    Lightning manual-optimization loop (reference src/models/oneprot_module.py:92-107)
  - `jax.sharding.Mesh` + XLA collectives (`all_gather`, `ppermute`) instead
    of NCCL DDP and hand-rolled SLURM rendezvous (reference src/distributed.py)
  - fused Pallas flash-attention kernels for all transformer encoders
  - length-bucketed, statically-shaped host input pipeline instead of dynamic
    per-batch padding
"""

__version__ = "0.1.0"
