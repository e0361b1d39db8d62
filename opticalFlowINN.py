"""Standalone trainer for the conv third stage — the flow->residual bridge INN
(reference ``opticalFlowINN.py`` + ``models/flow_motion.py``)."""
import sys

from FlowAutoencoderFC import run

if __name__ == "__main__":
    sys.exit(run("flow_motion", "config/flow_motion.yaml"))
