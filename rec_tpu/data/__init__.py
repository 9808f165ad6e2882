"""Dataset pipelines (ref examples/{lossless,lossy}/datasets.py)."""

from .datasets import (DatasetConfig, iterate_batches, load_images,
                       normalize, pad_to_multiple, write_png)

__all__ = ["DatasetConfig", "iterate_batches", "load_images", "normalize",
           "pad_to_multiple", "write_png"]
