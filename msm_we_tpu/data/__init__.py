"""Host-side data ingest: west.h5 reading and synthetic WE generation."""
from .synthetic import SynthWESettings, generate_trajectory_arrays, generate_west_h5
from .westh5 import WEDataset

__all__ = [
    "WEDataset",
    "SynthWESettings",
    "generate_west_h5",
    "generate_trajectory_arrays",
]
