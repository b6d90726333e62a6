from u2pl_tpu.data.loader import build_loaders, SegDataset, EpochLoader

__all__ = ["build_loaders", "SegDataset", "EpochLoader"]
