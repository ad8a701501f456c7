"""Live stats view of a running App -- the reference's performance
analyzer panel as a terminal UI.

The reference renders six windowed metrics every second while the
pipeline runs (app.js:694-721) plus a capture-to-results-table action
(app.js:737-789).  This drives the same App automation surface
(start/stop/get_stats, app.js:827-839) and repaints an ANSI table at
the reference's 1 s tick; on exit (or --seconds), captured rows print
as the results table.

Usage:
  python tools/live.py [--impl tpu_gop|tpu|libav] [--res 480p]
                       [--streams 8] [--seconds 30] [--qp 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


ROWS = (
    ("Input FPS", "input_fps", "{:.1f}"),
    ("Avg Output FPS (per stream)", "output_fps", "{:.1f}"),
    ("Avg encode ms/frame", "avg_encode_ms", "{:.2f}"),
    ("Avg copy ms/frame", "avg_copy_ms", "{:.2f}"),
    ("Total decode ms/s", "total_decode_ms", "{:.1f}"),
    ("Avg decode ms/frame", "avg_decode_ms", "{:.2f}"),
    ("Bitrate kbps", "bitrate_bps", lambda v: f"{v / 1e3:.0f}"),
    ("PSNR-Y dB", "psnr_y", "{:.2f}"),
    ("Dropped (capture)", "dropped_capture", "{:.0f}"),
)


def _fmt(spec, v):
    if v is None:
        return "-"
    try:
        return spec(v) if callable(spec) else spec.format(v)
    except (TypeError, ValueError):
        return str(v)


def render(stats: dict) -> str:
    width = 44
    lines = [
        f"tpu-h264 live  [{stats.get('impl', '?')}  "
        f"{stats.get('resolution', '?')} x{stats.get('streams', '?')} "
        f"threads={stats.get('threads', '?')}]",
        "-" * width,
    ]
    for label, key, spec in ROWS:
        lines.append(f"{label:<32}{_fmt(spec, stats.get(key)):>12}")
    lines.append("-" * width)
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="tpu_gop",
                    choices=("tpu_gop", "tpu", "libav"))
    ap.add_argument("--res", default="480p")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache")
    )
    from tpuh264.engine import CodecConfig
    from tpuh264.engine.app import App

    cfg = CodecConfig.from_params(
        {"res": args.res, "streams": str(args.streams), "qp": str(args.qp)}
    )
    cfg.intra_in_p = False
    app = App(cfg, impl=args.impl, source_kind="rigid")
    app.start()
    captured = []
    t0 = time.perf_counter()
    try:
        while time.perf_counter() - t0 < args.seconds:
            time.sleep(1.0)
            stats = app.get_stats()
            captured.append(stats)
            sys.stdout.write("\x1b[2J\x1b[H" + render(stats) + "\n")
            sys.stdout.flush()
    except KeyboardInterrupt:
        pass
    finally:
        app.stop()
    # results table on exit (app.js:801-824 analog)
    print("\ncaptured ticks:")
    print(f"{'t':>4} {'in fps':>8} {'out fps':>8} {'enc ms':>8} "
          f"{'dec ms':>8} {'kbps':>8} {'psnr':>7}")
    for i, s in enumerate(captured):
        print(
            f"{i:>4} {s.get('input_fps', 0):>8.1f} "
            f"{s.get('output_fps', 0):>8.1f} "
            f"{s.get('avg_encode_ms', 0):>8.2f} "
            f"{s.get('avg_decode_ms', 0):>8.2f} "
            f"{(s.get('bitrate_bps', 0) or 0) / 1e3:>8.0f} "
            f"{s.get('psnr_y', 0):>7.2f}"
        )


if __name__ == "__main__":
    main()
