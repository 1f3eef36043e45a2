"""Data-layer tests: TFRecord + Example codecs (cross-checked against
TensorFlow's writers/parsers, which are the format's reference
implementation) and the input pipeline."""

import io
import os

import numpy as np
import pytest

from ldm_tf2_tpu.data.example_proto import decode_example, encode_example
from ldm_tf2_tpu.data.tfrecord import TFRecordReader, TFRecordWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_example_roundtrip():
    features = {
        "image": b"\x00\x01jpegdata",
        "caption": [101, 7592, 102, 0, 0],
        "score": [0.5, -1.25],
    }
    data = encode_example(features)
    decoded = decode_example(data)
    assert decoded["image"] == [b"\x00\x01jpegdata"]
    assert decoded["caption"] == [101, 7592, 102, 0, 0]
    np.testing.assert_allclose(decoded["score"], [0.5, -1.25])


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    records = [b"hello", b"", b"x" * 10000]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    assert list(TFRecordReader(path, verify_crc=True)) == records


@pytest.mark.filterwarnings("ignore")
def test_interop_with_tensorflow(tmp_path):
    """Our files parse with tf.data and vice versa (byte-compat proof)."""
    tf = pytest.importorskip("tensorflow")

    ours = str(tmp_path / "ours.tfrecord")
    with TFRecordWriter(ours) as w:
        w.write(encode_example({"image": b"abc", "caption": [1, 2, 3]}))

    # TF reads ours
    ds = tf.data.TFRecordDataset(ours)
    raw = next(iter(ds)).numpy()
    parsed = tf.io.parse_single_example(
        raw,
        {
            "image": tf.io.FixedLenFeature([], "string"),
            "caption": tf.io.VarLenFeature("int64"),
        },
    )
    assert parsed["image"].numpy() == b"abc"
    np.testing.assert_array_equal(
        tf.sparse.to_dense(parsed["caption"]).numpy(), [1, 2, 3]
    )

    # we read TF's
    theirs = str(tmp_path / "theirs.tfrecord")
    with tf.io.TFRecordWriter(theirs) as w:
        ex = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "image": tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=[b"xyz"])
                    ),
                    "caption": tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[7, 8])
                    ),
                }
            )
        )
        w.write(ex.SerializeToString())
    rec = next(iter(TFRecordReader(theirs, verify_crc=True)))
    decoded = decode_example(rec)
    assert decoded["image"] == [b"xyz"]
    assert decoded["caption"] == [7, 8]


def _write_jpeg(path, size=(20, 30), color=(255, 0, 0)):
    from PIL import Image

    Image.new("RGB", size, color).save(path, "JPEG")


def test_convert_and_load_images(tmp_path):
    from ldm_tf2_tpu.data.dataset import (
        convert_images_to_tfrecord,
        create_dataset,
        list_tfrecords,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(6):
        p = str(img_dir / f"{i}.jpg")
        _write_jpeg(p, size=(20 + i, 30))
        paths.append(p)

    out = str(tmp_path / "records")
    convert_images_to_tfrecord(paths, out, num_shards=2)
    files = list_tfrecords(out)
    assert len(files) == 2

    it = create_dataset(files, batch_size=2, image_size=16, keys=("image",),
                        random_seed=0)
    batch = next(it)
    assert batch.shape == (2, 16, 16, 3)
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_pad_to_square_and_resize_match_tf():
    """Pixel-exact parity of pad-to-square + nearest resize vs the
    reference's tf.image chain (dataset.py:120-135)."""
    tf = pytest.importorskip("tensorflow")
    from ldm_tf2_tpu.data.dataset import process_image

    rng = np.random.RandomState(0)
    for h, w in [(20, 30), (33, 17), (16, 16)]:
        image = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        ours = process_image(image, 16)

        x = tf.cast(image, "float32") / 127.5 - 1.0
        if h > w:
            pad = h - w
            x = tf.pad(x, [[0, 0], [pad // 2, pad - pad // 2], [0, 0]])
        elif w > h:
            pad = w - h
            x = tf.pad(x, [[pad // 2, pad - pad // 2], [0, 0], [0, 0]])
        theirs = tf.image.resize(
            x, (16, 16), method=tf.image.ResizeMethod.NEAREST_NEIGHBOR
        ).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_tokenizer_null_condition():
    from ldm_tf2_tpu.data.tokenizer import null_condition_ids

    ids = null_condition_ids(3, max_length=8)
    assert ids.shape == (3, 8)
    np.testing.assert_array_equal(ids[0], [101, 102, 0, 0, 0, 0, 0, 0])


def test_cfg_token_ids_per_example_prompts(tmp_path):
    """A list of batch_size prompts yields per-example cond rows (additive;
    the reference tiles one prompt, run_ldm_sampler.py:28-46)."""
    pytest.importorskip("transformers")
    from ldm_tf2_tpu.data.tokenizer import cfg_token_ids, load_tokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "cat", "dog"]
    vocab_dir = tmp_path / "vocab"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text("\n".join(vocab) + "\n")
    tok = load_tokenizer(str(vocab_dir))

    single = cfg_token_ids(tok, "cat", 2, max_length=6)
    assert single.shape == (4, 6)
    np.testing.assert_array_equal(single[0], single[1])  # uncond tiled
    np.testing.assert_array_equal(single[2], single[3])  # prompt tiled

    multi = cfg_token_ids(tok, ["cat", "dog"], 2, max_length=6)
    assert multi.shape == (4, 6)
    np.testing.assert_array_equal(multi[:2], single[:2])  # same uncond
    np.testing.assert_array_equal(multi[2], single[2])    # "cat" row
    assert not np.array_equal(multi[3], multi[2])         # "dog" differs

    with pytest.raises(ValueError, match="one string or a list"):
        cfg_token_ids(tok, ["cat", "dog", "cat"], 2, max_length=6)

    # negative_prompt replaces the uncond half's "" (additive; the
    # reference hard-codes "" at run_ldm_sampler.py:28-46)
    neg = cfg_token_ids(tok, "cat", 2, max_length=6, negative_prompt="dog")
    np.testing.assert_array_equal(neg[2:], single[2:])  # cond unchanged
    np.testing.assert_array_equal(neg[0], neg[1])       # uncond tiled
    assert not np.array_equal(neg[0], single[0])        # "" -> "dog"
    dog_row = cfg_token_ids(tok, "dog", 1, max_length=6)[1]
    np.testing.assert_array_equal(neg[0], dog_row)


def test_indexed_dataset_deterministic_resume(tmp_path):
    """data/indexed.py: the batch at step s is a pure function of
    (seed, s) — an iterator started at step k reproduces a fresh run's
    batches bitwise (SURVEY §5 deterministic resume)."""
    from ldm_tf2_tpu.data.indexed import build_index, create_indexed_dataset
    from ldm_tf2_tpu.data.tfrecord import TFRecordWriter

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    records_dir = tmp_path / "records"
    records_dir.mkdir()
    # unique caption id per record to identify samples
    n = 8
    with TFRecordWriter(str(records_dir / "a.tfrecord")) as wa, \
         TFRecordWriter(str(records_dir / "b.tfrecord")) as wb:
        for i in range(n):
            p = str(img_dir / f"{i}.jpg")
            _write_jpeg(p, size=(18 + i, 24), color=(i * 30 % 256, 10, 10))
            with open(p, "rb") as f:
                img = f.read()
            rec = encode_example({"image": img, "caption": [100 + i, 0, 0]})
            (wa if i % 2 == 0 else wb).write(rec)

    files = sorted(str(p) for p in records_dir.glob("*.tfrecord"))
    index = build_index(files)
    assert len(index) == n

    kwargs = dict(
        batch_size=2, image_size=16, keys=("image", "caption"),
        flip=True, max_seq_len=3, random_seed=7,
    )
    it_a = create_indexed_dataset(files, **kwargs)
    run_a = [next(it_a) for _ in range(8)]  # 2 full epochs (4 steps each)

    # resume at step 3 reproduces the fresh run exactly (incl. flips)
    it_b = create_indexed_dataset(files, start_step=3, **kwargs)
    for s in range(3, 8):
        imgs_b, caps_b = next(it_b)
        np.testing.assert_array_equal(imgs_b, run_a[s][0])
        np.testing.assert_array_equal(caps_b, run_a[s][1])

    # multi-host sharding: two shard-iterators (shard_count=2, local batch
    # 1) concatenated in shard order == the single-host batch-2 run —
    # exact single-host equivalence of the global permutation slice.
    it_s0 = create_indexed_dataset(
        files, shard_index=0, shard_count=2,
        **{**kwargs, "batch_size": 1},
    )
    it_s1 = create_indexed_dataset(
        files, shard_index=1, shard_count=2,
        **{**kwargs, "batch_size": 1},
    )
    for s in range(8):
        imgs0, caps0 = next(it_s0)
        imgs1, caps1 = next(it_s1)
        np.testing.assert_array_equal(
            np.concatenate([imgs0, imgs1]), run_a[s][0]
        )
        np.testing.assert_array_equal(
            np.concatenate([caps0, caps1]), run_a[s][1]
        )

    # every record appears exactly once per epoch
    for epoch in range(2):
        ids = np.concatenate(
            [run_a[epoch * 4 + s][1][:, 0] for s in range(4)]
        )
        assert sorted(ids.tolist()) == [100 + i for i in range(n)]
    # epochs are shuffled differently
    e0 = np.concatenate([run_a[s][1][:, 0] for s in range(4)])
    e1 = np.concatenate([run_a[4 + s][1][:, 0] for s in range(4)])
    assert not np.array_equal(e0, e1)


def test_convert_coco_captions_to_tfrecord(tmp_path):
    """COCO annotations -> sharded TFRecords with pre-tokenized captions
    (reference dataset.py:43-82), loadable by create_dataset."""
    import json

    from ldm_tf2_tpu.data.dataset import (
        convert_coco_captions_to_tfrecord,
        create_dataset,
        list_tfrecords,
    )
    from ldm_tf2_tpu.data.tokenizer import load_tokenizer

    vocab = (
        ["[PAD]"] + [f"[unused{i}]" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + ["a", "cat", "dog", "on", "mat"]
    )
    vocab_dir = tmp_path / "bert_model"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text("\n".join(vocab) + "\n")
    tokenizer = load_tokenizer(str(vocab_dir))

    part = "train2017"
    (tmp_path / part).mkdir()
    (tmp_path / "annotations").mkdir()
    images, anns = [], []
    for i in range(4):
        name = f"img{i}.jpg"
        _write_jpeg(str(tmp_path / part / name), size=(20, 24))
        images.append({"id": i, "file_name": name})
        anns.append(
            {"image_id": i, "caption": "a cat on mat" if i % 2 else "a dog"}
        )
    ann_file = "captions_train2017.json"
    with open(tmp_path / "annotations" / ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)

    out = str(tmp_path / "records")
    convert_coco_captions_to_tfrecord(
        str(tmp_path), part, ann_file, tokenizer, out, max_length=8,
        num_shards=2,
    )
    files = list_tfrecords(out)
    assert len(files) == 2

    it = create_dataset(
        files, batch_size=2, image_size=16, keys=("image", "caption"),
        max_seq_len=8, random_seed=0,
    )
    imgs, caps = next(it)
    assert imgs.shape == (2, 16, 16, 3)
    assert caps.shape == (2, 8)
    # captions start with [CLS] (id 101) and contain real token ids
    assert set(caps[:, 0].tolist()) == {101}
    assert caps.max() > 101
