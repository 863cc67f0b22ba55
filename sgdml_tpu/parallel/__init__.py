"""Multi-chip scaling: device meshes, sharded assembly, distributed solves.

The reference's parallelism fabric is fork()+POSIX shared memory on one
host (sgdml/train.py:75-94) plus torch DataParallel. The TPU-native
equivalent is a single SPMD program over a ``jax.sharding.Mesh``: HBM-
resident sharded arrays, XLA collectives over ICI, no host communication.
"""
