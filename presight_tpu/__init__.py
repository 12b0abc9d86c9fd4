"""presight-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for building
city-scale NeRF priors from multi-camera drives (the capabilities of PreSight,
ECCV 2024, arXiv:2403.09079).

Sub-packages
------------
ops       Pure-functional math kernels: hash encoding, SH encoding, MLPs,
          volume-rendering weights, samplers, step functions.
fields    Radiance/density/sky fields, including the stacked multi-scene
          (mixture-of-NeRF-experts) router.
models    Full model assemblies (NerfactoNuscMS) with losses.
data      nuScenes dataparser, chunked pixel datasets, device prefetch.
engine    Jitted train step, optimizers/schedules, checkpointing, trainer.
parallel  Mesh/sharding specs for multi-chip training.
utils     Writer, profiler, colormaps, image metrics.
"""

__version__ = "0.1.0"
