"""Driver-contract regression: the 8-device CPU-mesh dryrun must stay green.

Round-1 failure mode: array creation inside dryrun_multichip touched the
default (axon/TPU) backend and died on a libtpu version mismatch. The
dryrun now pins everything to the CPU client; this test runs it exactly as
the driver does.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8_cpu_devices():
    import __graft_entry__ as entrymod
    n = min(8, len(jax.devices("cpu")))
    assert n == 8, "conftest must force 8 virtual CPU devices"
    entrymod.dryrun_multichip(8)  # raises/asserts on failure


def test_entry_compiles():
    import __graft_entry__ as entrymod
    fn, args = entrymod.entry()
    with jax.default_device(jax.devices("cpu")[0]):
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
