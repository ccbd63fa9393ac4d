from graphinvent_tpu.data.loader import HDFDataset, BlockLoader

__all__ = ["HDFDataset", "BlockLoader"]
