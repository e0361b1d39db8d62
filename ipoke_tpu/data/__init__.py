"""Data layer: on-disk artifact index, poke simulation, samplers, loaders."""

from .datamodule import StaticDataModule, ThreadedLoader, collate, device_prefetch
from .datasets import (
    Human36mDataset,
    IperDataset,
    PlantDataset,
    TaichiDataset,
    VideoDataset,
    get_dataset,
)
from .poke import FlowError, simulate_poke
from .samplers import FixedLengthSampler
from .synthetic import SyntheticDataset, make_batch
