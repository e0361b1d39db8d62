"""Host input-pipeline benchmark at the SHIPPED training scale.

Round-3 verdict weak #4: the only loader number was 248 clips/s at 64px
against a 143 clips/s shipped-scale (128px, B=40) train step — a <2x margin
that shrinks at 128px.  This tool measures the threaded loader
(``ipoke_tpu.data.datamodule.ThreadedLoader``) on the REAL item path —
PNG decode of 256px stored frames, .flow.npy load, resize to the training
resolution, full color+geometry augmentation, poke simulation — at 128px,
B=40, 10+1 frames (ref workload: config/second_stage.yaml:32, DataLoader
workers contract data/datamodule.py:35-38).

Synthetic on-disk tree (one-time, cached under --root) stands in for real
data; the byte volume per item (11 PNG reads + 1 flow read at 256px) matches
the prepared-dataset layout (data/prep.py writes the same artifacts).

Usage: python tools/bench_loader.py [--spatial 128] [--batch 40]
           [--workers 8,16,32] [--batches 12] [--root /tmp/ipoke_loader_bench]

Prints one line per worker count plus a final JSON summary with the best
rate and the headroom vs the 143 clips/s shipped train step.
"""

import argparse
import json
import os
import sys
import time

# `python tools/x.py` puts tools/ (not the repo root) on sys.path, and
# PYTHONPATH breaks the axon backend registration (CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_tree(root: str, n_videos: int, n_frames: int, stored: int):
    from ipoke_tpu.data.prep import make_synthetic_dataset

    marker = os.path.join(
        root, f"ready_{n_videos}x{n_frames}_{stored}px")
    if os.path.exists(marker):
        return
    os.makedirs(root, exist_ok=True)
    t0 = time.perf_counter()
    make_synthetic_dataset(root, n_videos=n_videos, n_frames=n_frames,
                           spatial_size=stored, flow_delta=10)
    open(marker, "w").close()
    print(f"synthetic tree built: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spatial", type=int, default=128)
    p.add_argument("--stored", type=int, default=256,
                   help="on-disk frame resolution (prep output size)")
    p.add_argument("--batch", type=int, default=40)
    p.add_argument("--workers", default="8,16,32")
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--root", default="/tmp/ipoke_loader_bench")
    p.add_argument("--frame-cache", action="store_true",
                   help="enable the decoded-frame raw cache (pre-populated "
                        "before timing; measures the steady-state epoch)")
    p.add_argument("--train-step-clips-s", type=float, default=143.0,
                   help="device train-step rate to report headroom against")
    args = p.parse_args()

    from ipoke_tpu.data.datamodule import StaticDataModule

    _build_tree(args.root, n_videos=8, n_frames=48, stored=args.stored)

    S = args.spatial
    # full shipped-training augmentation + poke config (ref
    # config/second_stage.yaml data block / data_preparation yamls)
    cfg = {
        "dataset": "PlantDataset", "spatial_size": (S, S), "max_frames": 10,
        "batch_size": args.batch, "poke_size": max(3, S // 128 * 10),
        "n_pokes": 5, "zero_poke": True, "zero_poke_amount": 12,
        "augment": True, "p_col": 0.8, "p_geom": 0.8, "augment_b": 0.4,
        "augment_c": 0.5, "augment_h": 0.15, "augment_s": 0.4,
        "aug_deg": 15, "aug_trans": (0.1, 0.1), "scale_poke_to_res": True,
        "yield_videos": True,
    }
    if args.frame_cache:
        cfg["frame_cache"] = "raw"
        cfg["n_workers"] = 0
        dm = StaticDataModule(cfg, ["images"], data_root=args.root)
        t0 = time.perf_counter()
        n = dm.dset_train.populate_frame_cache()
        print(f"frame cache populated: {n} frames, "
              f"{time.perf_counter() - t0:.0f}s (one-time)", file=sys.stderr)

    load1 = float(open("/proc/loadavg").read().split()[0])
    ncpu = os.cpu_count() or 1
    if load1 > 0.5 * ncpu:
        print(f"WARNING: host load {load1:.1f}/{ncpu} — rates will read low",
              file=sys.stderr)

    results = {}
    for nw in [int(w) for w in args.workers.split(",")]:
        cfg["n_workers"] = nw
        dm = StaticDataModule(cfg, ["images", "poke", "flow"],
                              data_root=args.root)
        n_total = args.warmup + args.batches
        it = iter(dm.train_loader(epoch=0, n_batches=n_total))
        for _ in range(args.warmup):
            next(it)
        t0 = time.perf_counter()
        n = 0
        for b in it:
            n += b["images"].shape[0]
        dt = time.perf_counter() - t0
        rate = n / dt
        results[nw] = rate
        print(f"workers={nw:3d}: {rate:7.1f} clips/s "
              f"({1e3 * args.batch / rate:.0f} ms/batch-{args.batch})",
              flush=True)

    best_nw = max(results, key=results.get)
    best = results[best_nw]
    print(json.dumps({
        "metric": f"loader_clips_per_sec_{S}px_full_aug",
        "value": round(best, 1),
        "unit": "clips/s",
        "workers": best_nw,
        "batch": args.batch,
        "headroom_vs_train_step": round(best / args.train_step_clips_s, 2),
        "host_load_at_start": load1,
        "cpus": ncpu,
    }))


if __name__ == "__main__":
    main()
