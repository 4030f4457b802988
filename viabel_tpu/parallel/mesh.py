"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2: no
DP/TP/PP/NCCL/MPI anywhere); parallelism in a VI workload lives on two axes
that are *new designs* here:

- ``mc``: the Monte Carlo sample axis — data parallelism over ICI, gradients
  combined with ``psum``/``pmean`` collectives emitted by ``shard_map``.
- ``restart``: independent optimization restarts (multi-start BBVI),
  embarrassingly parallel.
"""

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


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
