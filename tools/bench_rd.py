"""Real-clip RD table: ours vs libx264 at matched bitrate (VERDICT r4 #5).

Clips go through the Y4M FILE path (engine/sources.py write_y4m /
read_y4m) -- the route recorded standard clips take.  The build
environment has no network egress to fetch Akiyo/Foreman et al., so the
committed measurement uses the deterministic camera-like clip generator
(sources.clip_frames); pass --y4m one or more files to run the identical
measurement on real clips.

Output: one markdown RD table per (clip, resolution): x264 anchor
points (veryfast/zerolatency, the reference-grade RTC config) and our
closest-rate fixed-QP point, with the PSNR delta at matched bitrate.

Usage: python tools/bench_rd.py [--frames 16] [--y4m a.y4m b.y4m ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # deterministic; chip free

import numpy as np  # noqa: E402

from tpuh264.bench import quality  # noqa: E402
from tpuh264.engine import sources  # noqa: E402


def rd_table(name: str, frames, qps, anchors, fps=30):
    ours = [quality.our_rd_point(frames, qp, gop=30, fps=fps)
            for qp in qps]
    rows = []
    for bitrate in anchors:
        x = quality.x264_rd_point(
            [tuple(np.asarray(p, np.uint8) for p in f) for f in frames],
            bitrate, fps=fps,
        )
        best = min(ours, key=lambda o: abs(o["bits_per_s"]
                                           - x["bits_per_s"]))
        rows.append((x, best))
    h, w = frames[0][0].shape
    print(f"\n### {name} ({w}x{h}, {len(frames)} frames)\n")
    print("| x264 kbps | x264 PSNR | ours QP | ours kbps | ours PSNR |"
          " delta dB |")
    print("|---|---|---|---|---|---|")
    for x, o in rows:
        ratio = o["bits_per_s"] / max(x["bits_per_s"], 1)
        tag = "" if 0.75 <= ratio <= 1.33 else " (UNMATCHED rate)"
        print(f"| {x['bits_per_s']/1000:.0f} | {x['psnr']:.2f} "
              f"| {o['qp']} | {o['bits_per_s']/1000:.0f} "
              f"| {o['psnr']:.2f} | {o['psnr']-x['psnr']:+.2f}{tag} |")
    sys.stdout.flush()
    return [
        (x, o) for x, o in rows
        if 0.75 <= o["bits_per_s"] / max(x["bits_per_s"], 1) <= 1.33
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--y4m", nargs="*", default=None,
                    help="real clips; default: generated camera-like "
                         "clips through the same Y4M file path")
    ap.add_argument("--sizes", default="854x480,1280x720")
    args = ap.parse_args()

    clips = []
    if args.y4m:
        for path in args.y4m:
            clips.append((os.path.basename(path),
                          sources.read_y4m(path, args.frames)))
    else:
        for wh in args.sizes.split(","):
            w, h = (int(x) for x in wh.split("x"))
            for kind in ("meeting", "pan_detail"):
                fr = sources.clip_frames(w, h, args.frames, kind)
                # through the FILE path, like a real recorded clip
                p = os.path.join(tempfile.gettempdir(),
                                 f"clip_{kind}_{w}x{h}.y4m")
                sources.write_y4m(p, [
                    tuple(np.asarray(x, np.uint8) for x in f)
                    for f in fr
                ])
                clips.append((f"{kind}.y4m", sources.read_y4m(p)))

    deltas = []
    for name, frames in clips:
        rows = rd_table(
            name, frames,
            qps=(22, 25, 28, 31, 34, 37, 40, 43, 46, 49),
            anchors=(400_000, 1_000_000, 2_500_000),
        )
        deltas += [o["psnr"] - x["psnr"] for x, o in rows]
    print(f"\nmean delta over {len(deltas)} rate-MATCHED points "
          f"(within 33%): {np.mean(deltas):+.2f} dB "
          f"(min {min(deltas):+.2f})")


if __name__ == "__main__":
    main()
