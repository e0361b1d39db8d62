"""Standalone diversity scoring on saved sample arrays (reference
``testing/evaluate_diversity.py``): load ``samples_batch*.npy`` dumps
(B, S, T, H, W, 3) from a ``--test samples`` run and print pairwise
MSE / VGG-cosine diversity scores.

    python testing_evaluate_diversity.py --samples_dir \
        logs/second_stage/generated/<model>/samples
"""

import argparse
import glob
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples_dir", required=True)
    p.add_argument("--max_batches", type=int, default=10)
    args = p.parse_args()

    from ipoke_tpu.eval.metrics import diversity_score_mse, diversity_score_vgg
    from ipoke_tpu.nn.vgg import init_vgg_params

    files = sorted(glob.glob(os.path.join(args.samples_dir,
                                          "samples_batch*.npy")))
    assert files, f"no samples_batch*.npy in {args.samples_dir}"
    samples = np.concatenate(
        [np.load(f) for f in files[: args.max_batches]], axis=0)
    result = {
        "divscore_mse": diversity_score_mse(samples),
        "divscore_vgg": diversity_score_vgg(init_vgg_params(0), samples),
        "n_datapoints": int(samples.shape[0]),
        "n_samples_per_point": int(samples.shape[1]),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
