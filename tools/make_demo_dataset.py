"""Generate the end-to-end demo dataset: captioned colored shapes.

Writes reference-format TFRecords (image JPEG bytes + BERT token ids) that
drive the full framework loop — AE training, LDM training, sampling — on
data whose captions are simple enough that a small model trained for
minutes produces visibly caption-aligned samples.  Captions are tokenized
with the SHIPPED bert_model/vocab.txt through the same tokenizer the
caption converter uses (data/tokenizer.py), so the demo exercises the real
text path end to end.

  python tools/make_demo_dataset.py /tmp/demo_data [n_images] [size]
"""

import io
import os
import sys

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldm_tf2_tpu.data.example_proto import encode_example
from ldm_tf2_tpu.data.tfrecord import TFRecordWriter
from ldm_tf2_tpu.data.tokenizer import load_tokenizer, tokenize_prompts

COLORS = {
    "red": (220, 50, 40),
    "green": (50, 180, 70),
    "blue": (50, 90, 220),
    "yellow": (230, 200, 40),
}
SHAPES = ("circle", "square", "triangle", "cross")
SIZE = 64
MAX_SEQ_LEN = 16


def draw_sample(rng: np.random.RandomState, color: str, shape: str,
                size: int = SIZE):
    img = Image.new("RGB", (size, size),
                    tuple(rng.randint(180, 220, 3).tolist()))
    d = ImageDraw.Draw(img)
    c = COLORS[color]
    # half-size scaled with the canvas (same relative range as 18..26/64)
    s = rng.randint((18 * size) // 64, (26 * size) // 64)
    cx = rng.randint(s + 2, size - s - 2)
    cy = rng.randint(s + 2, size - s - 2)
    if shape == "circle":
        d.ellipse([cx - s, cy - s, cx + s, cy + s], fill=c)
    elif shape == "square":
        d.rectangle([cx - s, cy - s, cx + s, cy + s], fill=c)
    elif shape == "triangle":
        d.polygon([(cx, cy - s), (cx - s, cy + s), (cx + s, cy + s)], fill=c)
    else:  # cross
        w = s // 3
        d.rectangle([cx - s, cy - w, cx + s, cy + w], fill=c)
        d.rectangle([cx - w, cy - s, cx + w, cy + s], fill=c)
    return img


def main(out_dir: str, n: int = 4000, size: int = SIZE) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tokenizer = load_tokenizer(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bert_model")
    )
    prompts = [f"a {color} {shape}" for color in COLORS for shape in SHAPES]
    ids = tokenize_prompts(tokenizer, prompts, MAX_SEQ_LEN)

    rng = np.random.RandomState(0)
    num_shards = 4
    writers = [
        TFRecordWriter(os.path.join(out_dir, f"demo-{i:02d}.tfrecord"))
        for i in range(num_shards)
    ]
    for i in range(n):
        cls = rng.randint(len(prompts))
        color = list(COLORS)[cls // len(SHAPES)]
        shape = SHAPES[cls % len(SHAPES)]
        img = draw_sample(rng, color, shape, size)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        rec = encode_example(
            {"image": buf.getvalue(), "caption": ids[cls].tolist()}
        )
        writers[i % num_shards].write(rec)
    for w in writers:
        w.close()
    print(f"wrote {n} samples ({len(prompts)} captions) to {out_dir}")
    for p in prompts:
        print("  caption:", p)


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 4000,
        int(sys.argv[3]) if len(sys.argv) > 3 else SIZE,
    )
