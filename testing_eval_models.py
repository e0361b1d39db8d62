"""Batch evaluation driver (reference ``testing/eval_models.py``): sweep every
model listed in a text file through the requested ``--test`` modes.

    python testing_eval_models.py --models config/model_names.txt \
        --config config/second_stage.yaml --tests fvd accuracy diversity \
        --data_root $DATA
"""

import argparse
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", required=True,
                   help="text file with one model name per line")
    p.add_argument("--config", required=True)
    p.add_argument("--tests", nargs="+",
                   default=["fvd", "accuracy", "diversity", "kps_acc"])
    p.add_argument("--data_root", default=None)
    args = p.parse_args()

    with open(args.models) as f:
        names = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    failures = []
    for name in names:
        for mode in args.tests:
            cmd = [sys.executable, "main.py", "--config", args.config,
                   "--model_name", name, "--test", mode]
            if args.data_root:
                cmd += ["--data_root", args.data_root]
            print(f"== {name} / {mode} ==", flush=True)
            rc = subprocess.run(cmd).returncode
            if rc != 0:
                failures.append((name, mode, rc))
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
