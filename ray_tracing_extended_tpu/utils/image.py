"""Image export. Row 0 of framework images is the BOTTOM (Unity UV origin);
files are written top-down."""

from __future__ import annotations

import numpy as np


def save_png(path, img, tone: str = "none", exposure: float = 1.0):
    """Write a linear (H, W, 3) float image as sRGB PNG."""
    from PIL import Image

    from ..ops.tonemap import to_srgb8

    data = np.asarray(to_srgb8(img, tone=tone, exposure=exposure))
    Image.fromarray(data[::-1]).save(path)


def load_png(path) -> np.ndarray:
    """Read a PNG back to linear-ish float (sRGB decode), row 0 = bottom."""
    from PIL import Image

    data = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    srgb = data[::-1]
    lin = np.where(
        srgb <= 0.04045, srgb / 12.92, ((srgb + 0.055) / 1.055) ** 2.4
    )
    return lin.astype(np.float32)
