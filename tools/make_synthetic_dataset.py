"""Write a structured synthetic image dataset to disk for CLI-driven runs.

Materializes the gradient-blob family from train_quality_run.structured_batch
as PNG files consumable by FlatDirectoryImageDataset (the reference's
dataset contract, DataLoader.py:14-60), so the *public* train.py /
eval_metrics.py pipeline can be exercised end-to-end in the air-gapped
environment (no real dataset available).

  python tools/make_synthetic_dataset.py --out /tmp/data --n 2048 --res 128
"""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.train_quality_run import structured_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=256,
                    help="images generated per host-memory chunk")
    args = ap.parse_args()

    from PIL import Image
    os.makedirs(args.out, exist_ok=True)
    rs = np.random.RandomState(args.seed)
    done = 0
    while done < args.n:
        k = min(args.chunk, args.n - done)
        batch = structured_batch(rs, k, args.res)
        u8 = np.clip((batch + 1) * 127.5, 0, 255).astype(np.uint8)
        for i in range(k):
            Image.fromarray(u8[i]).save(
                os.path.join(args.out, f"{done + i:06d}.png"))
        done += k
        print(f"# {done}/{args.n}", file=sys.stderr, flush=True)
    print(f"wrote {done} images at {args.res}^2 to {args.out}")


if __name__ == "__main__":
    main()
