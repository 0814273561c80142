"""2D overlay compositor — the egui-integration analog.

The reference carries a raster egui paint backend for UI overlays on top of
the path-traced frame (bevy_integration/egui_paint.rs, 425 LoC of Vulkan
raster + its own descriptor heap). The TPU-native analog is a small batched
compositor over the LDR image: alpha-blended rects and a 5x7 bitmap font —
enough for the FPS/stats overlays the examples use (window example FPS
title, examples/window/main.rs:185-193). All jnp, jit-friendly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 5x7 bitmap font for ASCII 32..127 (each glyph: 7 rows of 5 bits).
_FONT_HEX = {
    " ": "0000000", "0": "1f11111111111f", "1": "0404040404040e",
}
# Compact generated font: rows encoded per char below.
_GLYPHS = {
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    "2": ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    "3": ["11110", "00001", "00001", "01110", "00001", "00001", "11110"],
    "4": ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    "6": ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    "7": ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    "8": ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    "9": ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
    ".": ["00000", "00000", "00000", "00000", "00000", "00110", "00110"],
    ":": ["00000", "00110", "00110", "00000", "00110", "00110", "00000"],
    "/": ["00001", "00010", "00010", "00100", "01000", "01000", "10000"],
    "-": ["00000", "00000", "00000", "11111", "00000", "00000", "00000"],
    " ": ["00000", "00000", "00000", "00000", "00000", "00000", "00000"],
    "F": ["11111", "10000", "10000", "11110", "10000", "10000", "10000"],
    "P": ["11110", "10001", "10001", "11110", "10000", "10000", "10000"],
    "S": ["01111", "10000", "10000", "01110", "00001", "00001", "11110"],
    "M": ["10001", "11011", "10101", "10101", "10001", "10001", "10001"],
    "R": ["11110", "10001", "10001", "11110", "10100", "10010", "10001"],
    "A": ["01110", "10001", "10001", "11111", "10001", "10001", "10001"],
    "Y": ["10001", "10001", "01010", "00100", "00100", "00100", "00100"],
    "X": ["10001", "10001", "01010", "00100", "01010", "10001", "10001"],
    "E": ["11111", "10000", "10000", "11110", "10000", "10000", "11111"],
    "T": ["11111", "00100", "00100", "00100", "00100", "00100", "00100"],
    "I": ["01110", "00100", "00100", "00100", "00100", "00100", "01110"],
    "N": ["10001", "11001", "10101", "10011", "10001", "10001", "10001"],
    "G": ["01110", "10001", "10000", "10111", "10001", "10001", "01111"],
}

GLYPH_W, GLYPH_H = 5, 7


def _glyph_mask(ch: str) -> np.ndarray:
    rows = _GLYPHS.get(ch.upper(), _GLYPHS[" "])
    return np.asarray(
        [[c == "1" for c in row] for row in rows], np.float32
    )


def draw_rect(img, x, y, w, h, color=(0.0, 0.0, 0.0), alpha=0.6):
    """Alpha-blend a rect onto (H, W, 3). Static coordinates."""
    ih, iw = img.shape[:2]
    x2, y2 = min(x + w, iw), min(y + h, ih)
    region = img[y:y2, x:x2]
    blended = region * (1.0 - alpha) + jnp.asarray(color) * alpha
    return img.at[y:y2, x:x2].set(blended)


def draw_text(img, text: str, x: int, y: int, color=(1.0, 1.0, 1.0),
              scale: int = 1):
    """Draw bitmap text onto (H, W, 3). Static text/coords (host compose)."""
    ih, iw = img.shape[:2]
    cx = x
    for ch in text:
        mask = _glyph_mask(ch)
        if scale > 1:
            mask = np.kron(mask, np.ones((scale, scale), np.float32))
        gh, gw = mask.shape
        if cx + gw >= iw or y + gh >= ih:
            break
        m = jnp.asarray(mask)[..., None]
        region = img[y : y + gh, cx : cx + gw]
        img = img.at[y : y + gh, cx : cx + gw].set(
            region * (1.0 - m) + jnp.asarray(color) * m
        )
        cx += gw + scale
    return img


def stats_overlay(img, lines, origin=(4, 4), scale: int = 1):
    """Draw a boxed stats block (the FPS-title / egui-overlay analog)."""
    x, y = origin
    gh = (GLYPH_H + 1) * scale
    width = max((len(t) for t in lines), default=0) * (GLYPH_W + 1) * scale + 8
    img = draw_rect(img, x - 2, y - 2, width, gh * len(lines) + 4)
    for i, text in enumerate(lines):
        img = draw_text(img, text, x, y + i * gh, scale=scale)
    return img
