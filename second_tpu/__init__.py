"""second_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for LiDAR 3D object
detection with temporal fusion, providing the capabilities of the SECOND-v1.5-derived
stack at jhkohpav/3dobject_detection_temporal (see SURVEY.md).

Layout:
    config/    text-proto pipeline config parsing + typed schema
    core/      host-side numpy numeric core (golden oracle, data prep)
    ops/       JAX/Pallas device ops (voxelize, box math, rotated IoU, NMS, sparse conv)
    models/    flax model layer (VFE, middle extractors, RPN heads, detectors)
    data/      KITTI dataset + preprocessing pipeline
    train/     training runtime (optimizer, schedules, checkpoint, metrics, loop)
    parallel/  device-mesh / sharding utilities
    utils/     KITTI eval, logging, misc
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the fhd eval program takes minutes to
# compile on a tunneled runtime; cached recompiles are near-instant. Set
# before jax initializes its config (importing second_tpu precedes any
# framework jax use); a user-set value wins.
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache"))
del _os
