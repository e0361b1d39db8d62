"""Datamodule smoke/stat sweep (reference ``iper_loader_test.py``): iterate
the train loader and report flow/poke statistics."""
import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--dataset", default="IperDataset")
    p.add_argument("--spatial_size", type=int, default=64)
    p.add_argument("--n_batches", type=int, default=10)
    args = p.parse_args()

    from ipoke_tpu.data import StaticDataModule

    cfg = {"dataset": args.dataset,
           "spatial_size": (args.spatial_size, args.spatial_size),
           "max_frames": 10, "batch_size": 4, "n_workers": 4,
           "poke_size": 5, "n_pokes": 5, "zero_poke": True,
           "zero_poke_amount": 12, "yield_videos": True,
           "scale_poke_to_res": True}
    dm = StaticDataModule(cfg, ["images", "poke", "flow"],
                          data_root=args.data_root)
    mags, n_zero = [], 0
    for batch in dm.train_loader(n_batches=args.n_batches):
        m = np.linalg.norm(batch["flow"], axis=-1)
        mags.append(m)
        n_zero += int((m.reshape(m.shape[0], -1).max(-1) == 0).sum())
    mags = np.concatenate(mags)
    print(f"flow magnitude: mean={mags.mean():.3f} p99="
          f"{np.percentile(mags, 99):.3f}; zero-poke samples: {n_zero}")


if __name__ == "__main__":
    main()
