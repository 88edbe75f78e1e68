"""Frame output: PNG (via PIL) and raw NPY dumps."""

from __future__ import annotations

import numpy as np


def save_png(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as PNG."""
    from PIL import Image

    Image.fromarray(np.asarray(img, dtype=np.uint8), mode="RGB").save(path)


def save_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img))
