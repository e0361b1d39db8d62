"""ipoke_tpu — TPU-native framework for poke-conditioned stochastic video
synthesis (see README.md)."""

__version__ = "0.1.0"
