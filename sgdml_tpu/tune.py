"""Inference auto-tuner with a persistent benchmark cache.

The reference hill-climbs (num_workers x chunk_size x bulk_mp) process
configurations and caches results in ``_bmark_cache.npz``
(sgdml/predict.py:770-1127). Under XLA most of that tuning disappears —
the only remaining knob is the static batch-bucket size, which trades
compile count against padding waste and pipelining. This module measures a
small ladder of bucket sizes once per (molecule size, model size, device)
and persists the winner.
"""

from __future__ import annotations

import json
import logging
import os
import timeit

import numpy as np

log = logging.getLogger(__name__)

_CACHE_ENV = 'SGDML_TPU_BMARK_CACHE'
_DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    '.bmark_cache.json',
)

BUCKET_LADDER = (64, 128, 256, 512, 1024)


def _cache_path() -> str:
    return os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)


def _load_cache() -> dict:
    path = _cache_path()
    if os.path.exists(path):
        try:
            with open(path) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            pass
    return {}


def _save_cache(cache: dict):
    try:
        with open(_cache_path(), 'w') as fh:
            json.dump(cache, fh, indent=1)
    except OSError:
        pass


def reset_cache():
    path = _cache_path()
    if os.path.exists(path):
        os.remove(path)
        return True
    return False


def _cache_key(
    n_atoms, n_train, n_perms, n_bulk, dtype, transfer_dtype, n_dev
) -> str:
    import jax

    dev = jax.devices()[0].platform
    # transfer_dtype and the mesh device count are part of the key: a
    # bucket tuned for f64 transfers must not be replayed for an
    # f32-transfer predictor, nor a single-chip bucket for a mesh.
    tdt = 'none' if transfer_dtype is None else np.dtype(transfer_dtype).name
    return '%d-%d-%d-%d-%s-%s-%dx%s' % (
        n_atoms, n_train, n_perms, n_bulk, dtype, tdt, n_dev, dev
    )


def prepare_parallel(predictor, n_bulk: int = 1000, n_reps: int = 3,
                     use_cache: bool = True):
    """Pick the fastest batch-bucket size for ``predictor`` and install it.

    Returns the measured throughput (geometries/sec) at the chosen bucket.
    Results are cached per (N, M, P, n_bulk, dtype, device).
    """
    key = _cache_key(
        predictor.n_atoms,
        predictor.n_train,
        predictor.n_perms,
        n_bulk,
        np.dtype(predictor.dtype).name,
        predictor.transfer_dtype,
        predictor._n_dev,
    )
    cache = _load_cache() if use_cache else {}
    if key in cache:
        predictor.batch_size = int(cache[key]['batch_size'])
        log.info(
            'Using cached batch size %d (%.0f geoms/sec).',
            predictor.batch_size,
            cache[key]['gps'],
        )
        return cache[key]['gps']

    rng = np.random.default_rng(0)
    R = rng.normal(size=(n_bulk, predictor.dim_i))

    best = (None, 0.0)
    for bucket in BUCKET_LADDER:
        # Measure every rung up to and *including* the first one that
        # covers the whole request in a single launch (a bucket >= n_bulk
        # is a legitimate candidate: one padded launch often beats many
        # small ones on high-latency links); only rungs beyond that are
        # pure padding waste.
        if bucket >= 2 * max(n_bulk, 32):
            break
        bucket = -(-bucket // predictor._n_dev) * predictor._n_dev
        predictor.batch_size = bucket
        predictor.predict(R[:bucket])  # compile warm-up
        times = []
        for _ in range(n_reps):
            t0 = timeit.default_timer()
            predictor.predict(R)
            times.append(timeit.default_timer() - t0)
        gps = n_bulk / min(times)
        log.info('bucket %4d -> %.0f geoms/sec', bucket, gps)
        if gps > best[1]:
            best = (bucket, gps)

    predictor.batch_size = best[0]
    if use_cache:
        cache[key] = {'batch_size': best[0], 'gps': best[1]}
        _save_cache(cache)
    return best[1]
