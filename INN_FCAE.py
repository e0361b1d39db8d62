"""Unconditional INN density model on frozen BigAE flow latents
(reference ``INN_FCAE.py`` + ``experiments/fully_connected_ae_INN.py``)."""
import sys

from FlowAutoencoderFC import run

if __name__ == "__main__":
    sys.exit(run("inn_fcae", "config/inn_fcae.yaml"))
