"""One-time conversion of the reference's TF `lpips.ckpt-1` to our format.

  python tools/convert_lpips_tf_to_jax.py --tf_ckpt lpips.ckpt-1 \
      --out lpips-1
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tf_ckpt", required=True,
                        help="TF checkpoint prefix (e.g. lpips.ckpt-1)")
    parser.add_argument("--out", required=True, help="Output orbax dir")
    args = parser.parse_args()

    from ldm_tf2_tpu.checkpoints.convert_lpips import (
        convert_lpips_tf_checkpoint,
    )
    from ldm_tf2_tpu.checkpoints.manager import save_params

    params = convert_lpips_tf_checkpoint(args.tf_ckpt)
    save_params(args.out, params)
    print(f"[INFO] wrote {args.out}")


if __name__ == "__main__":
    main()
