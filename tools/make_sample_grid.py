"""Assemble the sampler CLI's images.npy into a PNG grid artifact.

  python tools/make_sample_grid.py images.npy samples/grid.png [cols]

The reference ships its evidence as PNG grids in samples/ (README.md:156);
this writes the equivalent artifact from our sampler output.
"""

import sys

import numpy as np
from PIL import Image


def main(npy_path: str, out_path: str, cols: int = 4) -> None:
    images = np.load(npy_path)  # [N, H, W, 3] uint8 (sampler output)
    if images.dtype != np.uint8:
        lo, hi = images.min(), images.max()
        images = ((images - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)
    n, h, w, _ = images.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    Image.fromarray(grid).save(out_path)
    print(f"wrote {out_path}: {rows}x{cols} grid of {h}x{w}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 4)
