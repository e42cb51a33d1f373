"""Display transforms.

The reference's output path is the accumulator's LDR clamp
(Accumulate.shader:50) blitted straight to screen - i.e. linear [0, 1] values
displayed as-is. ``to_srgb8`` reproduces that look for PNG export when fed
clamp-accumulated images; HDR renders can apply exposure and a filmic curve
first (extensions).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(x):
    """IEC 61966-2-1 transfer (what a display applies to the reference's
    linear frame buffer)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308,
        x * 12.92,
        1.055 * jnp.power(x, 1.0 / 2.4) - 0.055,
    )


def reinhard(x, exposure: float = 1.0):
    """Simple HDR -> LDR curve for unclamped accumulation."""
    x = x * exposure
    return x / (1.0 + x)


def aces(x, exposure: float = 1.0):
    """ACES filmic approximation (Narkowicz 2015 public fit)."""
    x = x * exposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def to_srgb8(img, tone: str = "none", exposure: float = 1.0):
    """Linear (H, W, 3) -> uint8 sRGB, optionally tone-mapped first."""
    if tone == "reinhard":
        img = reinhard(img, exposure)
    elif tone == "aces":
        img = aces(img, exposure)
    elif tone != "none":
        raise ValueError(f"unknown tone mode {tone!r}")
    srgb = linear_to_srgb(img)
    return (srgb * 255.0 + 0.5).astype(jnp.uint8)
