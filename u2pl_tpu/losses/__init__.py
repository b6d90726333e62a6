from u2pl_tpu.losses.ce import cross_entropy_ignore, supervised_loss
from u2pl_tpu.losses.ohem import ohem_cross_entropy
from u2pl_tpu.losses.unsup import compute_unsupervised_loss
from u2pl_tpu.losses.contrastive import compute_contra_memobank_loss

__all__ = [
    "cross_entropy_ignore",
    "supervised_loss",
    "ohem_cross_entropy",
    "compute_unsupervised_loss",
    "compute_contra_memobank_loss",
]
