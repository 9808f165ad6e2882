"""Dataset pipelines (ref examples/{lossless,lossy}/datasets.py).

The reference uses tfds (mnist/binarized_mnist/cifar10/imagenet32/imagenet64)
plus glob+PNG pipelines for CLIC/Kodak with random 256-crops.  This build is
a zero-egress environment, so loaders resolve in order:
  1. local arrays (``<data_dir>/<name>.npz`` with an "images" entry, or a
     directory of .npy/.png files),
  2. a deterministic synthetic fallback (labelled as such) so every pipeline
     stays runnable end-to-end without downloads.

Normalization matches the reference: lossless models see [-0.5, 0.5]
(ref lossless/datasets.py:142-151); lossy models see [0, 1].
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

DATASET_SHAPES = {
    "mnist": (28, 28, 1),
    "binarized_mnist": (28, 28, 1),
    "cifar10": (32, 32, 3),
    "imagenet32": (32, 32, 3),
    "imagenet64": (64, 64, 3),
    "kodak": (512, 768, 3),
    "clic2019": (256, 256, 3),
    # Real-photograph datasets buildable offline from matplotlib's bundled
    # grace_hopper.jpg (examples/make_local_datasets.py): 32x32 patches with
    # a spatial train/test split, and the full photo as a Kodak-like image.
    "hopper32": (32, 32, 3),
    "hopper256": (256, 256, 3),
    "hopper384": (384, 384, 3),
    "hopper512": (600, 512, 3),
    # Multi-photo corpus (examples/make_local_datasets.py round 5): 384px
    # training patches from the TRAIN photos, plus per-photo held-out test
    # sets named photo_<name> whose shapes vary — any dataset name outside
    # this table resolves from its local file only (no synthetic fallback).
    "photos384": (384, 384, 3),
}


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    dataset: str = "cifar10"
    data_dir: str = "data"
    split: str = "train"
    normalize: str = "centered"  # "centered" [-0.5,0.5] | "unit" [0,1]
    crop_size: Optional[int] = None  # random crop (CLIC training, ref :113-130)
    synthetic_size: int = 256  # fallback dataset size


def _load_png_dir(path: str) -> Optional[np.ndarray]:
    files = sorted(glob.glob(os.path.join(path, "*.png"))
                   + glob.glob(os.path.join(path, "*.npy")))
    if not files:
        return None
    from PIL import Image

    images = []
    for f in files:
        if f.endswith(".npy"):
            images.append(np.load(f))
        else:
            images.append(np.asarray(Image.open(f).convert("RGB")))
    return np.stack(images) if len({i.shape for i in images}) == 1 else images


def load_images(cfg: DatasetConfig) -> Tuple[np.ndarray, bool]:
    """Returns (uint8-ish images in [0, 255] float32, is_synthetic)."""
    npz = os.path.join(cfg.data_dir, f"{cfg.dataset}_{cfg.split}.npz")
    if os.path.exists(npz):
        return np.load(npz)["images"].astype(np.float32), False
    png_dir = os.path.join(cfg.data_dir, cfg.dataset, cfg.split)
    if os.path.isdir(png_dir):
        imgs = _load_png_dir(png_dir)
        if imgs is not None:
            return np.asarray(imgs, np.float32), False
    # Names outside the shape table (e.g. the photo_<name> held-out images)
    # resolve from their local file ONLY: a synthetic stand-in for a "held
    # out photograph" would silently poison results.
    if cfg.dataset not in DATASET_SHAPES:
        raise FileNotFoundError(
            f"dataset {cfg.dataset!r} has no local file {npz} and no "
            f"synthetic shape — run examples/make_local_datasets.py")
    shape = DATASET_SHAPES[cfg.dataset]
    # Synthetic fallback: smooth random fields, deterministic per dataset
    # (crc32, not Python hash(), which is salted per process).
    import zlib

    rs = np.random.RandomState(zlib.crc32(cfg.dataset.encode()) % (2 ** 31))
    n = cfg.synthetic_size
    imgs = rs.rand(n, *shape).astype(np.float32)
    # Blur for spatial correlation so the data is compressible.
    from scipy.ndimage import uniform_filter

    imgs = uniform_filter(imgs, size=(1, 5, 5, 1), mode="wrap")
    if cfg.dataset == "binarized_mnist":
        imgs = (imgs > imgs.mean()).astype(np.float32) * 255.0
    else:
        imgs = 255.0 * (imgs - imgs.min()) / (imgs.max() - imgs.min())
    return imgs, True


def normalize(images: np.ndarray, mode: str) -> np.ndarray:
    x = images / 255.0
    if mode == "centered":
        return x - 0.5
    return x


def iterate_batches(cfg: DatasetConfig, batch_size: int, seed: int = 0,
                    repeat: bool = True) -> Iterator[np.ndarray]:
    """Shuffled, batched, optionally random-cropped stream."""
    images, _ = load_images(cfg)
    images = normalize(images, cfg.normalize)
    rs = np.random.RandomState(seed)
    n = len(images)
    while True:
        order = rs.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            batch = images[order[i:i + batch_size]]
            if cfg.crop_size:
                c = cfg.crop_size
                h0 = rs.randint(0, batch.shape[1] - c + 1)
                w0 = rs.randint(0, batch.shape[2] - c + 1)
                batch = batch[:, h0:h0 + c, w0:w0 + c]
            yield batch
        if not repeat:
            return


def pad_to_multiple(image: np.ndarray, multiple: int = 64) -> np.ndarray:
    """Reflect-pad H, W up to a multiple (the reference resizes to x64
    multiples before compression, ref compression_performance.py:311-312)."""
    h, w = image.shape[-3], image.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return image
    pad = [(0, 0)] * (image.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(image, pad, mode="reflect")


def write_png(path: str, image: np.ndarray) -> None:
    """Quantize [0,1] float image to PNG (ref datasets.py write_png)."""
    from PIL import Image

    arr = np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
