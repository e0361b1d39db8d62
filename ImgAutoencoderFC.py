"""Standalone trainer for the BigGAN-AE on images (reference ``ImgAutoencoderFC.py``)."""
import sys

from FlowAutoencoderFC import run

if __name__ == "__main__":
    sys.exit(run("flow_encoder_fc", "config/img_encoder_fc.yaml"))
