"""Standalone trainer for the BigGAN-AE flow encoder on optical-flow maps
(reference ``FlowAutoencoderFC.py``): `python FlowAutoencoderFC.py -c config/flow_encoder_fc.yaml --model_name <name>`."""
import argparse
import sys

import main as _main


def run(default_experiment, default_config):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", default=default_config)
    p.add_argument("--model_name", default="fcae")
    p.add_argument("--data_root", default=None)
    p.add_argument("--debug", action="store_true")
    a = p.parse_args()
    argv = ["--config", a.config, "--model_name", a.model_name]
    if a.data_root:
        argv += ["--data_root", a.data_root]
    if a.debug:
        argv += ["--debug"]
    return _main.main(argv)


if __name__ == "__main__":
    sys.exit(run("flow_encoder_fc", "config/flow_encoder_fc.yaml"))
