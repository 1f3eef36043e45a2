"""TFRecord converters + host-side input pipeline.

API-compatible counterpart of /root/reference/dataset.py, TF-free:

* `convert_images_to_tfrecord` / `convert_coco_captions_to_tfrecord` write
  the same round-robin-sharded Example records (dataset.py:28-82) via our
  own TFRecord/Example codecs — files interop with the reference's tf.data
  pipeline and vice versa.
* `create_dataset` mirrors the reference's transform chain
  (dataset.py:85-146): filename shuffle + repeat -> per-file record shuffle
  buffer -> JPEG decode -> /127.5 - 1 normalize -> centered pad-to-square ->
  **nearest** resize (half-pixel centers, like tf.image.resize v2) ->
  optional horizontal flip -> drop-remainder batching.  It returns a
  generator of numpy batches with background prefetching (a thread pool
  decodes ahead), designed to feed `jax.device_put` with batch sharding.
"""

from __future__ import annotations

import glob
import io
import json
import os
import queue
import random
import threading
from typing import Iterator, Sequence

import numpy as np

from ldm_tf2_tpu.data.example_proto import decode_example, encode_example
from ldm_tf2_tpu.data.tfrecord import TFRecordReader, TFRecordWriter

BUFFER_SIZE = 1024


def _image_example(image_path: str, caption: Sequence[int] | None = None) -> bytes:
    with open(image_path, "rb") as f:
        image_bytes = f.read()
    features: dict[str, object] = {"image": image_bytes}
    if caption is not None:
        features["caption"] = list(caption)
    return encode_example(features)


def convert_images_to_tfrecord(
    filenames: Sequence[str], out_path: str, num_shards: int = 100
) -> None:
    """Round-robin shard raw JPEG bytes into `num_shards` TFRecord files
    (dataset.py:28-41; same shard naming)."""
    os.makedirs(out_path, exist_ok=True)
    writers = [
        TFRecordWriter(
            os.path.join(out_path, f"images_{i:02d}-{num_shards:02d}.tfrecord")
        )
        for i in range(num_shards)
    ]
    for shard, path in enumerate(filenames):
        writers[shard % num_shards].write(_image_example(path))
    for w in writers:
        w.close()


def convert_coco_captions_to_tfrecord(
    root_path: str,
    part: str,
    ann_filename: str,
    tokenizer,
    out_path: str,
    max_length: int = 77,
    num_shards: int = 20,
) -> None:
    """COCO captions -> sharded TFRecords with pre-tokenized captions
    (dataset.py:43-82).  `tokenizer` is a HF BertTokenizerFast."""
    with open(os.path.join(root_path, "annotations", ann_filename)) as f:
        raw = json.load(f)
    image_dict = {image["id"]: image for image in raw["images"]}

    os.makedirs(out_path, exist_ok=True)
    writers = [
        TFRecordWriter(
            os.path.join(
                out_path, f"coco_caption_{i:02d}-{num_shards:02d}.tfrecord"
            )
        )
        for i in range(num_shards)
    ]
    for shard, ann in enumerate(raw["annotations"]):
        image_path = os.path.join(
            root_path, part, image_dict[ann["image_id"]]["file_name"]
        )
        ids = tokenizer(
            ann["caption"],
            truncation=True,
            max_length=max_length,
            padding="max_length",
        )["input_ids"]
        writers[shard % num_shards].write(_image_example(image_path, ids))
    for w in writers:
        w.close()


def _decode_jpeg(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _pad_to_square(image: np.ndarray) -> np.ndarray:
    """Centered zero-pad to square (dataset.py:121-133)."""
    h, w = image.shape[:2]
    if h > w:
        pad = h - w
        lo = pad // 2
        return np.pad(image, [(0, 0), (lo, pad - lo), (0, 0)])
    if w > h:
        pad = w - h
        lo = pad // 2
        return np.pad(image, [(lo, pad - lo), (0, 0), (0, 0)])
    return image


def _nearest_resize(image: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor with half-pixel centers (tf.image.resize v2
    semantics, dataset.py:134-135)."""
    h, w = image.shape[:2]
    rows = np.clip(
        np.floor((np.arange(size) + 0.5) * (h / size)).astype(np.int64), 0, h - 1
    )
    cols = np.clip(
        np.floor((np.arange(size) + 0.5) * (w / size)).astype(np.int64), 0, w - 1
    )
    return image[rows[:, None], cols[None, :]]


def process_image(
    image: np.ndarray,
    image_size: int,
    flip: bool = False,
    rng: random.Random | None = None,
) -> np.ndarray:
    """Normalize + pad-to-square + nearest resize (dataset.py:116-136)."""
    if flip and rng is not None and rng.random() < 0.5:
        image = image[:, ::-1]
    image = image.astype(np.float32) / 127.5 - 1.0
    image = _pad_to_square(image)
    return _nearest_resize(image, image_size)


def _record_stream(
    filenames: Sequence[str], seed: int | None, buffer_size: int
) -> Iterator[bytes]:
    """Shuffled, repeated record stream: filename shuffle + per-file shuffle
    buffer (dataset.py:96-99)."""
    rng = random.Random(seed)
    files = list(filenames)
    while True:
        rng.shuffle(files)
        for path in files:
            buffer: list[bytes] = []
            for record in TFRecordReader(path):
                buffer.append(record)
                if len(buffer) >= buffer_size:
                    idx = rng.randrange(len(buffer))
                    buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
                    yield buffer.pop()
            rng.shuffle(buffer)
            yield from buffer


def create_dataset(
    filenames: Sequence[str],
    batch_size: int = 1,
    image_size: int = 256,
    keys: Sequence[str] = ("image", "caption"),
    flip: bool = False,
    max_seq_len: int = 77,
    random_seed: int | None = None,
    prefetch: int = 2,
    num_workers: int = 8,
) -> Iterator:
    """Infinite iterator of numpy batches.

    Yields `images [B, S, S, 3] float32` or `(images, captions [B, L] int64)`
    when "caption" in keys — mirroring the reference's element spec
    (dataset.py:138-146).  Decoding runs in a thread pool; `prefetch`
    batches are staged ahead of the consumer.

    Multi-host: shard the *files* per process first (`shard_for_process`)
    and pass `batch_size = global // process_count`; the indexed loader
    (data/indexed.py) instead slices a shared global permutation, which
    keeps exact single-host equivalence.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ldm_tf2_tpu.data import native

    rng = random.Random(random_seed)
    with_captions = "caption" in keys
    records = _record_stream(filenames, random_seed, BUFFER_SIZE)
    pool = ThreadPoolExecutor(max_workers=num_workers)
    use_native = native.available()

    def make_one(record: bytes):
        do_flip = flip and rng.random() < 0.5
        if use_native:
            # C++ hot path: proto walk + libjpeg decode + transform, all
            # outside the GIL (ldm_tf2_tpu/data/native).
            jpeg = native.example_image_bytes(record)
            image = (
                native.decode_and_process(jpeg, image_size, do_flip)
                if jpeg is not None
                else None
            )
            if image is not None:
                if with_captions:
                    caption = native.example_caption(record, max_seq_len)
                    return image, caption
                return image
            # fall through to python path on decode failure
        example = decode_example(record)
        image = _decode_jpeg(example["image"][0])
        if do_flip:
            image = image[:, ::-1]
        image = process_image(image, image_size)
        if with_captions:
            caption = np.asarray(example["caption"], dtype=np.int64)
            caption = caption[:max_seq_len]
            if caption.shape[0] < max_seq_len:
                caption = np.pad(caption, (0, max_seq_len - caption.shape[0]))
            return image, caption
        return image

    def batches():
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def producer():
            try:
                while not stop.is_set():
                    futures = [
                        pool.submit(make_one, next(records))
                        for _ in range(batch_size)
                    ]
                    items = [f.result() for f in futures]
                    if with_captions:
                        images = np.stack([i[0] for i in items])
                        captions = np.stack([i[1] for i in items])
                        q.put((images, captions))
                    else:
                        q.put(np.stack(items))
            except StopIteration:
                pass
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()

    return batches()


def list_tfrecords(root_path: str) -> list[str]:
    """Glob *.tfrecord under a directory (run_ldm_trainer.py:32-33)."""
    return sorted(glob.glob(os.path.join(root_path, "*.tfrecord")))


def shard_for_process(filenames: Sequence[str]) -> list[str]:
    """Multi-host data sharding: each JAX process reads a disjoint
    round-robin subset of the shard files (the reference is single-process;
    this is the standard per-host split for DCN-scale training).  Falls back
    to all files when there are fewer files than processes."""
    import jax

    count, index = jax.process_count(), jax.process_index()
    if count == 1 or len(filenames) < count:
        return list(filenames)
    return [f for i, f in enumerate(filenames) if i % count == index]
