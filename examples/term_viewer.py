"""Terminal live viewer — an ACTUAL interactive display client for the
platform this framework runs on (a headless accelerator host reached over
ssh/tmux: the terminal IS the display engine).

Presents frames as ANSI half-block art (each character cell = two
vertical pixels via the upper-half-block glyph with separate fg/bg
colors) and
reads WASD/QE + arrow-key look input from raw stdin — the examples/window
fly-cam loop (reference: examples/window/main.rs) on a real surface
instead of a PNG sequence. Drives the same EngineAdapter contract as the
HTTP viewer and the Bevy-analog plugin (integrations/engine.py).

Usage:
  python examples/term_viewer.py [--size 160x96] [--cpu] [--frames N]
  (run inside tmux/a real terminal; --frames for scripted benchmarking)

Keys: w/a/s/d move, q/e down/up, arrows look, x quits.
"""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import argparse
import os
import select
import sys
import termios
import time
import tty

import numpy as np

from sunray_tpu.config import RenderConfig
from sunray_tpu.integrations.engine import FlyCameraAdapter
from sunray_tpu.render.renderer import Renderer
from sunray_tpu.scene import cornell_box

ESC = "\x1b"


def frame_to_ansi(img: np.ndarray) -> str:
    """(H, W, 3) float -> ANSI string, two pixels per character cell
    (upper half block: fg = top row, bg = bottom row)."""
    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h = u8.shape[0] - (u8.shape[0] % 2)
    top = u8[0:h:2]
    bot = u8[1:h:2]
    rows = []
    for y in range(top.shape[0]):
        cells = []
        for x in range(top.shape[1]):
            tr, tg, tb = (int(v) for v in top[y, x])
            br, bg_, bb = (int(v) for v in bot[y, x])
            cells.append(
                f"{ESC}[38;2;{tr};{tg};{tb}m{ESC}[48;2;{br};{bg_};{bb}m▀"
            )
        rows.append("".join(cells) + f"{ESC}[0m")
    return "\n".join(rows)


class RawTerm:
    """cbreak stdin for non-blocking key reads (restores on exit)."""

    def __enter__(self):
        self.fd = sys.stdin.fileno()
        try:
            self.saved = termios.tcgetattr(self.fd)
            tty.setcbreak(self.fd)
            self.raw = True
        except (termios.error, OSError):
            self.raw = False     # piped stdin (scripted run)
        return self

    def __exit__(self, *exc):
        if self.raw:
            termios.tcsetattr(self.fd, termios.TCSADRAIN, self.saved)

    def read_keys(self):
        keys = []
        dx = dy = 0.0
        if not self.raw:
            return keys, dx, dy
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == ESC:  # arrow keys: ESC [ A/B/C/D
                rest = sys.stdin.read(2) if select.select(
                    [sys.stdin], [], [], 0)[0] else ""
                if rest.endswith("A"):
                    dy -= 40
                elif rest.endswith("B"):
                    dy += 40
                elif rest.endswith("C"):
                    dx += 40
                elif rest.endswith("D"):
                    dx -= 40
            elif ch:
                keys.append(ch.lower())
        return keys, dx, dy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="160x96",
                    help="render WxH; terminal shows W x H/2 cells")
    ap.add_argument("--frames", type=int, default=0,
                    help="exit after N frames (0 = run until 'x')")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    w, h = (int(x) for x in args.size.split("x"))

    cfg = RenderConfig(width=w, height=h, lighting="restir",
                       denoise_passes=2)
    r = Renderer(cfg)
    r.load_scene(cornell_box())
    adapter = FlyCameraAdapter()
    adapter.flycam.position = np.array([1.0, 1.0, 3.4])

    sys.stdout.write(f"{ESC}[2J")          # clear once
    t_prev = time.time()
    fps = 0.0
    frame = 0
    with RawTerm() as term:
        while True:
            keys, dx, dy = term.read_keys()
            if "x" in keys:
                break
            t_now = time.time()
            dt = max(t_now - t_prev, 1e-6)
            adapter.queue_input([k for k in keys if k in "wasdqe"], dx, dy)
            cam, instances = adapter.extract(t_now, dt)
            ldr = np.asarray(r.render(cam, instances=instances))
            inst = 1.0 / max(time.time() - t_prev, 1e-6)
            fps = inst if fps == 0 else 0.9 * fps + 0.1 * inst
            t_prev = time.time()
            sys.stdout.write(f"{ESC}[H")   # home cursor, no flicker clear
            sys.stdout.write(frame_to_ansi(ldr))
            sys.stdout.write(
                f"\n{ESC}[0mFPS {fps:6.2f}  frame {frame:5d}  "
                f"pos {np.round(adapter.flycam.position, 2)}  "
                f"[wasdqe move, arrows look, x quits]{ESC}[K\n"
            )
            sys.stdout.flush()
            frame += 1
            if args.frames and frame >= args.frames:
                break
    print(f"{ESC}[0m\nterm_viewer: {frame} frames, steady fps {fps:.2f}")


if __name__ == "__main__":
    main()
