"""Offline tile cutter: chop images into non-overlapping square tiles.

Counterpart of /root/reference/image_splitter.py:4-52.

Usage:
  python image_splitter.py --input-dir imgs/ --output-dir tiles/ --tile-size 128
"""

from __future__ import annotations

import argparse
import os


def split_image(path: str, out_dir: str, tile: int) -> int:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    stem = os.path.splitext(os.path.basename(path))[0]
    count = 0
    for y in range(0, img.height - tile + 1, tile):
        for x in range(0, img.width - tile + 1, tile):
            img.crop((x, y, x + tile, y + tile)).save(
                os.path.join(out_dir, f"{stem}_y{y:04d}_x{x:04d}.png")
            )
            count += 1
    return count


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-dir", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--tile-size", type=int, default=128)
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    total = 0
    for name in sorted(os.listdir(args.input_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp")):
            continue
        total += split_image(
            os.path.join(args.input_dir, name), args.output_dir, args.tile_size
        )
    print(f"wrote {total} tiles to {args.output_dir}")


if __name__ == "__main__":
    main()
