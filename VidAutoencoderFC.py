"""Standalone trainer for the FC video baseline (reference ``VidAutoencoderFC.py``)."""
import sys

from FlowAutoencoderFC import run

if __name__ == "__main__":
    sys.exit(run("first_stage_fc", "config/first_stage_fc.yaml"))
