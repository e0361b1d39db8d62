"""CLI entry point — reference-compatible surface (reference ``main.py``).

    python main.py --config config/<stage>.yaml --model_name <name>
                   [--test {none,fvd,accuracy,samples,diversity,transfer,
                            control_sensitivity,kps_acc}]
                   [--resume] [--last_ckpt] [--target_version N]
                   [--data_root PATH] [--debug]

Differences by design: ``--gpus`` becomes ``--devices`` (a count of mesh
devices; the data-parallel mesh replaces CUDA_VISIBLE_DEVICES), and dataset
location comes from ``--data_root`` / ``data.data_root`` / the ``DATAPATH``
env var (reference ``check_ckpt_paths``, main.py:65-75).
"""

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ipoke_tpu trainer/evaluator")
    p.add_argument("--config", required=True)
    p.add_argument("--model_name", required=True)
    p.add_argument("--devices", type=int, default=None,
                   help="number of mesh devices (default: all)")
    p.add_argument("--gpus", type=str, default=None,
                   help="accepted for reference-CLI compatibility; ignored")
    p.add_argument("--test", default="none",
                   choices=["none", "fvd", "accuracy", "samples", "diversity",
                            "kps_acc", "transfer", "control_sensitivity",
                            "realism"])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--last_ckpt", action="store_true")
    p.add_argument("--target_version", type=int, default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


def load_parameters(args):
    from ipoke_tpu.core.checkpoint import create_dir_structure
    from ipoke_tpu.core.config import load_config

    config = load_config(args.config)
    gen = config["general"]
    gen["model_name"] = args.model_name
    gen["test"] = args.test
    gen["resume"] = args.resume
    gen["last_ckpt"] = args.last_ckpt
    if args.debug:
        gen["debug"] = True
    if args.target_version is not None:
        gen["target_version"] = args.target_version
    base_dir = os.environ.get("DATAPATH_BASE", gen.get("base_dir", "logs"))
    dirs = create_dir_structure(base_dir, gen["experiment"], args.model_name)
    data_root = (args.data_root or config.get_path("data.data_root")
                 or os.environ.get("DATAPATH"))
    return config, dirs, data_root


def maybe_prompt_resume(config, dirs):
    """Interactive resume-on-name-collision prompt (reference main.py:39-55),
    gated on a TTY so headless/CI runs never block on input()."""
    from ipoke_tpu.core.checkpoint import latest_version

    gen = config["general"]
    if (gen.get("test", "none") != "none" or gen.get("resume")
            or gen.get("debug") or gen.get("target_version") is not None):
        return
    if latest_version(dirs["ckpt"]) is None:
        return
    if not (sys.stdin.isatty() and sys.stdout.isatty()):
        return
    print("WARNING: model has been started somewhen earlier: "
          "resume training (y/n)?")
    while True:
        answer = input().strip().lower()
        if answer in ("y", "yes"):
            gen["resume"] = True
            return
        if answer in ("n", "no"):
            return
        print("Invalid answer! Try again! (y/n)")


def main(argv=None):
    args = parse_args(argv)
    config, dirs, data_root = load_parameters(args)
    maybe_prompt_resume(config, dirs)

    from ipoke_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()

    from ipoke_tpu.cli.experiments import select_experiment

    cls = select_experiment(config)
    experiment = cls(config, dirs, data_root=data_root)
    if args.test == "none":
        experiment.train()
    else:
        from ipoke_tpu.cli.testing import run_test

        run_test(experiment, args.test)
    return 0


if __name__ == "__main__":
    sys.exit(main())
