"""TFRecord conversion CLI.

Counterpart of /root/reference/run_tfrecord_converters.py, but flag-driven
instead of hard-coded paths (run_tfrecord_converters.py:8-43):

  python -m ldm_tf2_tpu.cli.run_tfrecord_converters \
      --images_glob '/data/celebahq/*.jpg' --images_out /data/tfrecords
  python -m ldm_tf2_tpu.cli.run_tfrecord_converters \
      --coco_root /data/coco --coco_part train2017 \
      --coco_annotations captions_train2017.json \
      --captions_out /data/tfrecords_captions --vocab_dir bert_model
"""

from __future__ import annotations

import glob

from absl import app, flags

flags.DEFINE_string("images_glob", None, "Glob of images to convert.")
flags.DEFINE_string("images_out", None, "Output dir for image TFRecords.")
flags.DEFINE_integer("image_shards", 100, "Number of image shards.")

flags.DEFINE_string("coco_root", None, "COCO root directory.")
flags.DEFINE_string("coco_part", "train2017", "COCO split directory name.")
flags.DEFINE_string(
    "coco_annotations", "captions_train2017.json", "Annotation filename."
)
flags.DEFINE_string("captions_out", None, "Output dir for caption TFRecords.")
flags.DEFINE_integer("caption_shards", 20, "Number of caption shards.")
flags.DEFINE_string("vocab_dir", "bert_model", "BERT vocab directory.")
flags.DEFINE_integer("max_length", 77, "Max caption token length.")

FLAGS = flags.FLAGS


def main(_):
    from ldm_tf2_tpu.data.dataset import (
        convert_coco_captions_to_tfrecord,
        convert_images_to_tfrecord,
    )
    from ldm_tf2_tpu.data.tokenizer import load_tokenizer

    did_something = False
    if FLAGS.images_glob and FLAGS.images_out:
        filenames = sorted(glob.glob(FLAGS.images_glob))
        print(f"[INFO] Converting {len(filenames)} images "
              f"-> {FLAGS.images_out}")
        convert_images_to_tfrecord(
            filenames, FLAGS.images_out, FLAGS.image_shards
        )
        did_something = True

    if FLAGS.coco_root and FLAGS.captions_out:
        tokenizer = load_tokenizer(FLAGS.vocab_dir)
        print(f"[INFO] Converting COCO captions -> {FLAGS.captions_out}")
        convert_coco_captions_to_tfrecord(
            FLAGS.coco_root,
            FLAGS.coco_part,
            FLAGS.coco_annotations,
            tokenizer,
            FLAGS.captions_out,
            FLAGS.max_length,
            FLAGS.caption_shards,
        )
        did_something = True

    if not did_something:
        raise app.UsageError(
            "Provide --images_glob/--images_out and/or "
            "--coco_root/--captions_out."
        )


if __name__ == "__main__":
    app.run(main)
