"""Conv FlowVAE + INN experiment (reference ``INN_test.py`` +
``models/INN_experiment.py`` — a near-duplicate of the flow_motion stack)."""
import sys

from FlowAutoencoderFC import run

if __name__ == "__main__":
    sys.exit(run("flow_motion", "config/flow_motion.yaml"))
