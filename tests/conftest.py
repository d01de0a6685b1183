"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the TPU analog of
"test multi-node without a cluster" — SURVEY.md §4).

NOTE: in this image the 'axon' TPU plugin ignores JAX_PLATFORMS=cpu and
stays the preferred backend, so we (a) request 8 virtual CPU devices via
XLA_FLAGS before jax initializes, and (b) pin jax's default device to
cpu:0 so unsharded test computations run on CPU. Sharding tests must
build their mesh from jax.devices('cpu').
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # respected by stock jax

# persistent XLA compile cache: the suite is compile-bound (~30-60 min
# first run); repeat runs reuse every compiled test program
# (rpagp.utils.compile_cache; RPAGP_COMPILE_CACHE=off disables)
from rpagp.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

_cpus = jax.devices("cpu")
jax.config.update("jax_default_device", _cpus[0])
