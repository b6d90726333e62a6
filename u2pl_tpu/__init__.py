"""u2pl_tpu — a TPU-native JAX/Flax/XLA semi-supervised semantic-segmentation
framework with the capabilities of U2PL (CVPR 2022).

Re-designed TPU-first rather than translated: the semi-supervised train step
(student fwd/bwd, EMA teacher, entropy partition, contrastive memory-bank
loss, queue updates, SyncBN, gradient reduction) is one fused SPMD program
compiled by XLA over a `jax.sharding.Mesh`, with zero per-step host syncs.

Reference behavior inventory: /root/repo/SURVEY.md (cites the original
PyTorch implementation by file:line).
"""

__version__ = "0.1.0"
