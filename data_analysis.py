"""Optical-flow dataset statistics / visualization (reference
``data_analysis.py``): sweep .flow.npy files, print magnitude stats, write
colorized flow previews."""
import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--processed_dir", required=True)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--max_files", type=int, default=100)
    args = p.parse_args()

    from ipoke_tpu.utils.video import flow_to_rgb

    files = sorted(glob.glob(os.path.join(
        args.processed_dir, "**", "*.flow.npy"), recursive=True))
    files = files[: args.max_files]
    mags = []
    for f in files:
        flow = np.load(f)
        mags.append(np.linalg.norm(flow, axis=0))
    mags = np.stack(mags)
    print(f"{len(files)} flow files; magnitude mean={mags.mean():.3f} "
          f"std={mags.std():.3f} p95={np.percentile(mags, 95):.3f} "
          f"max={mags.max():.3f}")
    if args.out_dir:
        import cv2

        os.makedirs(args.out_dir, exist_ok=True)
        for f in files[:16]:
            flow = np.transpose(np.load(f), (1, 2, 0))
            rgb = flow_to_rgb(flow)
            name = os.path.basename(os.path.dirname(f)) + "_" + \
                os.path.basename(f).replace(".flow.npy", ".png")
            cv2.imwrite(os.path.join(args.out_dir, name), rgb[..., ::-1])


if __name__ == "__main__":
    main()
