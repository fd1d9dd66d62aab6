from .pipeline import ExamplePrep, PrepConfig
from .synthetic import SyntheticDataset, sample_scene

__all__ = ["ExamplePrep", "PrepConfig", "SyntheticDataset", "sample_scene"]
