"""Data layer: TFRecord I/O, tf.train.Example codec, host-side input pipeline.

The reference leans on tf.data + tf.train for everything here
(/root/reference/dataset.py); this framework is TF-free at runtime — the
TFRecord container format and the Example protobuf wire format are
implemented from scratch (they are tiny, stable formats), and the pipeline
is a prefetching host loader that feeds device-resident batches.
"""

from ldm_tf2_tpu.data.dataset import (
    convert_coco_captions_to_tfrecord,
    convert_images_to_tfrecord,
    create_dataset,
)
from ldm_tf2_tpu.data.tfrecord import TFRecordReader, TFRecordWriter

__all__ = [
    "TFRecordReader",
    "TFRecordWriter",
    "convert_coco_captions_to_tfrecord",
    "convert_images_to_tfrecord",
    "create_dataset",
]
