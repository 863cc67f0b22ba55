"""sGDML-TPU: a TPU-native reconstruction of symmetric Gradient Domain
Machine Learning (sGDML) force fields, built on JAX/XLA/Pallas.

This is a from-scratch, TPU-first framework with the capabilities of the
reference sGDML implementation (stefanch/sGDML): it reconstructs
energy-conserving molecular force fields ``F(r)`` (plus potential energy
``E(r)``) from small numbers of reference geometries by kernel ridge
regression in the gradient domain, using the Hessian of a Matern-5/2 kernel
over an inverse-pairwise-distance descriptor, optionally symmetrized over a
discovered atom-permutation group.

Design stance (TPU-native, not a port):

* All hot paths (kernel assembly, prediction, CG matvec) are expressed as
  MXU-shaped matmuls over permuted descriptor tables; the pairwise
  difference tensor is never materialized.
* The descriptor Jacobian factorizes through a static signed incidence
  matrix, so Jacobian contractions are einsums instead of scatters.
* Multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives over ICI (no multiprocessing pools, no shared host memory).
* Training solves run in float64 (matching the reference, see
  reference ``sgdml/torchtools.py:49``); inference offers a float32 fast
  path.

Reference parity: on-disk ``.npz`` dataset/task/model schemas are
byte-layout compatible with the reference (see ``sgdml/utils/io.py`` and
``sgdml/train.py:793-831`` in the reference), so models trained with either
framework can be evaluated by the other.
"""

import logging

__version__ = '0.1.0'

# Custom log level between INFO and WARNING signalling the completion of a
# pipeline step (mirrors the reference's logging UX, sgdml/__init__.py:31).
LOG_LEVEL_DONE = 25
logging.addLevelName(LOG_LEVEL_DONE, 'DONE')


def _done(self, message, *args, **kws):
    if self.isEnabledFor(LOG_LEVEL_DONE):
        self._log(LOG_LEVEL_DONE, message, args, **kws)


logging.Logger.done = _done

MAX_PRINT_WIDTH = 100


def enable_x64():
    """Enable double precision in JAX.

    Kernel ridge regression in the gradient domain genuinely needs f64 for
    the linear solves (the reference is float64 throughout). This is called
    automatically when :mod:`sgdml_tpu.train` is imported; inference can
    still run in float32 by passing f32 inputs.
    """
    import jax

    jax.config.update('jax_enable_x64', True)


def enable_compile_cache():
    """Enable JAX's persistent compilation cache.

    TPU compiles (especially via remote-compile tunnels) cost tens of
    seconds per program; the disk cache makes every program a one-time
    cost across processes.
    """
    import os

    import jax

    cache_dir = os.environ.get(
        'SGDML_TPU_COMPILE_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(__file__)), '.jax_cache'),
    )
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # config names can shift between JAX versions
        pass


enable_x64()
enable_compile_cache()
