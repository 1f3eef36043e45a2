"""Host input-pipeline throughput: native C++ loader vs pure Python.

Generates a synthetic sharded TFRecord dataset of JPEGs, then measures
images/sec through `create_dataset` (streaming) and
`create_indexed_dataset` (deterministic) with the native path on and off.

  python tools/bench_loader.py [num_images] [image_px]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_data(root: str, n: int, px: int) -> list[str]:
    from PIL import Image

    from ldm_tf2_tpu.data.dataset import convert_images_to_tfrecord

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(img_dir, f"{i}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (px + i % 7, px, 3), dtype=np.uint8)
        ).save(p, "JPEG", quality=90)
        paths.append(p)
    out = os.path.join(root, "records")
    convert_images_to_tfrecord(paths, out, num_shards=4)
    from ldm_tf2_tpu.data.dataset import list_tfrecords

    return list_tfrecords(out)


def run(files, batches: int, batch_size: int, image_size: int, indexed: bool):
    if indexed:
        from ldm_tf2_tpu.data.indexed import create_indexed_dataset

        it = create_indexed_dataset(
            files, batch_size=batch_size, image_size=image_size,
            keys=("image",), random_seed=0,
        )
    else:
        from ldm_tf2_tpu.data.dataset import create_dataset

        it = create_dataset(
            files, batch_size=batch_size, image_size=image_size,
            keys=("image",), random_seed=0,
        )
    next(it)  # warm the pool / page cache
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    dt = time.perf_counter() - t0
    return batches * batch_size / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    px = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from ldm_tf2_tpu.data import native

    with tempfile.TemporaryDirectory() as root:
        files = make_data(root, n, px)
        for indexed in (False, True):
            rates = {}
            for use_native in (True, False):
                if use_native and not native.available():
                    continue
                native.set_enabled(use_native)
                rates["native" if use_native else "python"] = round(
                    run(files, batches=16, batch_size=16, image_size=256,
                        indexed=indexed), 1
                )
            native.set_enabled(True)
            print(json.dumps({
                "loader": "indexed" if indexed else "streaming",
                "source_px": px,
                "images_per_sec": rates,
            }))


if __name__ == "__main__":
    main()
