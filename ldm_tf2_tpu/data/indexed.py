"""Deterministic, resumable input pipeline (index-based sampling).

SURVEY.md §5 (failure detection / elastic recovery) calls for
deterministic data-iterator checkpointing as the TPU-native upgrade over
the reference's restart-from-scratch recovery (model_runners.py:200-205):
after a preemption, training must resume mid-epoch on exactly the batches
it would have seen.  The streaming loader (`dataset.create_dataset`)
mirrors the reference's shuffle-buffer semantics and cannot seek; this
module provides the grain-style alternative:

* ``build_index`` scans each TFRecord once, skipping payloads, and
  records (file, payload_offset, length) for every record — O(records)
  seeks, no decoding.
* Each epoch is a seeded global permutation of the index; the batch for
  global step s is ``perm(seed, epoch)[b*B:(b+1)*B]`` — a pure function
  of (seed, step).  Resume = pass ``start_step``; no iterator state needs
  checkpointing beyond the step number already in the train state.
* Horizontal flips are decided by a counter-based RNG keyed on
  (seed, epoch, record index) — also reproducible.

Enabled in the trainer CLIs with ``tpu.deterministic_data: true``.
"""

from __future__ import annotations

import queue
import random
import struct
import threading
from typing import Iterator, Sequence

import numpy as np

from ldm_tf2_tpu.data.dataset import _decode_jpeg, process_image
from ldm_tf2_tpu.data.example_proto import decode_example


def build_index(filenames: Sequence[str]) -> np.ndarray:
    """[N, 3] int64 (file_idx, payload_offset, payload_length), scanning
    record framing only (no payload reads).  Uses the C++ scanner
    (native.scan_index) when available; Python fallback is bit-identical
    (tests/test_native_loader.py)."""
    from ldm_tf2_tpu.data import native

    use_native = native.available()
    entries = []
    for file_idx, path in enumerate(filenames):
        if use_native:
            scanned = native.scan_index(path)
            if scanned is not None:
                if len(scanned):
                    col = np.full((len(scanned), 1), file_idx, np.int64)
                    entries.append(np.concatenate([col, scanned], axis=1))
                continue
        rows = []
        with open(path, "rb") as f:
            offset = 0
            while True:
                header = f.read(12)
                if len(header) < 12:
                    break
                (length,) = struct.unpack("<Q", header[:8])
                rows.append((file_idx, offset + 12, length))
                offset += 12 + length + 4
                f.seek(offset)
        if rows:
            entries.append(np.asarray(rows, dtype=np.int64))
    if not entries:
        raise ValueError(f"no records found in {len(filenames)} files")
    return np.concatenate(entries, axis=0)


def _read_record(path: str, offset: int, length: int) -> bytes:
    from ldm_tf2_tpu.data import native

    if native.available():
        data = native.pread(path, offset, length)
        if data is not None:
            return data
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)


def _flip_coin(seed: int, epoch: int, index: int) -> bool:
    return random.Random(f"{seed}/{epoch}/{index}").random() < 0.5


def _process_record(
    record: bytes,
    image_size: int,
    with_captions: bool,
    max_seq_len: int,
    do_flip: bool,
):
    """JPEG decode + reference transform chain; native C++ hot path when
    available (same as dataset.create_dataset)."""
    from ldm_tf2_tpu.data import native

    if native.available():
        jpeg = native.example_image_bytes(record)
        if jpeg is not None:
            image = native.decode_and_process(jpeg, image_size, do_flip)
            if image is not None:
                if with_captions:
                    return image, native.example_caption(record, max_seq_len)
                return image
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


def create_indexed_dataset(
    filenames: Sequence[str],
    batch_size: int = 1,
    image_size: int = 256,
    keys: Sequence[str] = ("image", "caption"),
    flip: bool = False,
    max_seq_len: int = 77,
    random_seed: int | None = None,
    start_step: int = 0,
    prefetch: int = 2,
    num_workers: int = 8,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Iterator:
    """Infinite deterministic iterator; batch at global step s is a pure
    function of (random_seed, s).  Same element spec as
    ``dataset.create_dataset``.

    Multi-host: pass ``shard_index=jax.process_index()``,
    ``shard_count=jax.process_count()``.  The *global* batch at step s is
    the same seeded permutation slice on every host (size ``batch_size *
    shard_count``); this process materializes only its ``batch_size``-row
    slice of it, so concatenating the per-host batches in shard order
    reproduces the single-host run exactly (test_data.py).
    """
    from concurrent.futures import ThreadPoolExecutor

    if not (0 <= shard_index < shard_count):
        raise ValueError(f"shard {shard_index} not in [0, {shard_count})")
    seed = 0 if random_seed is None else int(random_seed)
    index = build_index(filenames)
    n = len(index)
    global_batch = batch_size * shard_count
    if n < global_batch:
        raise ValueError(f"{n} records < global batch {global_batch}")
    steps_per_epoch = n // global_batch  # drop remainder (dataset.py:145)
    with_captions = "caption" in keys
    pool = ThreadPoolExecutor(max_workers=num_workers)

    def load_one(epoch: int, rec_idx: int):
        file_idx, offset, length = index[rec_idx]
        record = _read_record(filenames[int(file_idx)], int(offset), int(length))
        do_flip = flip and _flip_coin(seed, epoch, int(rec_idx))
        return _process_record(
            record, image_size, with_captions, max_seq_len, do_flip
        )

    def batches():
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def producer():
            step = start_step
            perm_epoch, perm = -1, None
            try:
                while not stop.is_set():
                    epoch, local = divmod(step, steps_per_epoch)
                    if epoch != perm_epoch:
                        perm = np.random.default_rng(
                            [seed, epoch]
                        ).permutation(n)
                        perm_epoch = epoch
                    start = local * global_batch + shard_index * batch_size
                    ids = perm[start : start + batch_size]
                    futures = [
                        pool.submit(load_one, epoch, int(i)) for i in ids
                    ]
                    items = [f.result() for f in futures]
                    if with_captions:
                        q.put(
                            (
                                np.stack([i[0] for i in items]),
                                np.stack([i[1] for i in items]),
                            )
                        )
                    else:
                        q.put(np.stack(items))
                    step += 1
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
