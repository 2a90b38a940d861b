"""Per-pixel RMSE between two images (the BASELINE.md parity metric).

Usage: python tools/rmse.py a.png b.png [--luma]

Accepts PNG/JPG via PIL; resizes b to a's resolution if needed (nearest).
Prints one JSON line {"rmse": ..., "psnr_db": ...}.
"""

import argparse
import json

import numpy as np


def load(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--luma", action="store_true",
                    help="compare Rec.709-ish luminance only")
    args = ap.parse_args()
    a = load(args.a)
    b = load(args.b)
    if a.shape != b.shape:
        from PIL import Image

        b = np.asarray(
            Image.fromarray((b * 255).astype(np.uint8)).resize(
                (a.shape[1], a.shape[0]), Image.NEAREST
            ),
            dtype=np.float32,
        ) / 255.0
    if args.luma:
        w = np.array([0.2125, 0.7154, 0.0721], np.float32)
        a = a @ w
        b = b @ w
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    psnr = float(20 * np.log10(1.0 / max(rmse, 1e-9)))
    print(json.dumps({"rmse": round(rmse, 6), "psnr_db": round(psnr, 2)}))


if __name__ == "__main__":
    main()
