"""Frame directory -> video (parity with reference tools/rgb2video.py).

Uses imageio's ffmpeg writer when available; otherwise falls back to an
animated GIF via PIL so the tool still produces a shareable artifact in
minimal environments.
"""

from __future__ import annotations

import argparse
import glob
import os


def frames_to_video(frame_dir, out_path, fps=15, pattern="*.png"):
    files = sorted(glob.glob(os.path.join(frame_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no frames matching {pattern} in {frame_dir}")
    try:
        import imageio
        with imageio.get_writer(out_path, fps=fps) as w:
            for f in files:
                w.append_data(imageio.imread(f))
        return out_path
    except Exception:
        from PIL import Image
        gif = os.path.splitext(out_path)[0] + ".gif"
        imgs = [Image.open(f) for f in files]
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return gif


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frame_dir", required=True)
    parser.add_argument("--out", default="out.mp4")
    parser.add_argument("--fps", type=int, default=15)
    parser.add_argument("--pattern", default="*.png")
    args = parser.parse_args()
    out = frames_to_video(args.frame_dir, args.out, args.fps, args.pattern)
    print("wrote", out)


if __name__ == "__main__":
    main()
