"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2: no
DP/TP/PP/NCCL/MPI anywhere); parallelism in a VI workload lives on two axes
that are *new designs* here:

- ``mc``: the Monte Carlo sample axis — data parallelism over ICI, gradients
  combined with ``psum``/``pmean`` collectives emitted by ``shard_map``.
- ``restart``: independent optimization restarts (multi-start BBVI),
  embarrassingly parallel.
"""

import os

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "distributed_init"]


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None, **kwargs):
    """Join a multi-host JAX cluster and return the global device list.

    Thin wiring over :func:`jax.distributed.initialize`: call once per
    process before any other jax API, then build meshes with
    :func:`make_mesh` over the returned *global* devices — ``shard_map`` /
    ``NamedSharding`` programs written against a single-host mesh run
    unchanged on a multi-host one (collectives ride ICI within a slice and
    DCN across slices; lay the ``mc`` axis innermost so the per-step
    gradient ``pmean`` stays on ICI).

    With no arguments, initialization is attempted only when a cluster
    environment is detectable (the standard ``JAX_COORDINATOR_ADDRESS`` /
    TPU pod environment variables); single-process runs return
    ``jax.devices()`` untouched, so library code may call this
    unconditionally.
    """
    detectable = (coordinator_address is not None
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or os.environ.get("COORDINATOR_ADDRESS")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if detectable:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
    return jax.devices()


def make_mesh(shape=None, axis_names=("mc",), devices=None):
    """Build a ``jax.sharding.Mesh`` over the available devices.

    Parameters
    ----------
    shape : tuple of int, optional
        Mesh shape; defaults to all devices on one ``mc`` axis.
    axis_names : tuple of str
        One name per mesh dimension.
    devices : list, optional
        Devices to use (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)
