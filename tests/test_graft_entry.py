"""Driver-contract regression tests for __graft_entry__.

Round-1 failure mode (MULTICHIP_r01.json): the driver calls
``dryrun_multichip(8)`` in-process on a host whose jax backend is the one
real TPU chip, so the entry must build its own virtual CPU mesh via a
subprocess.  Both delivery paths are exercised here.
"""

import sys

import jax
import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
import __graft_entry__ as graft  # noqa: E402


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    f, g, h = out
    assert f.shape == (8192,) and g.shape == (8192, 3) and h.shape == (8192, 3, 3)


def test_dryrun_in_process():
    # conftest forces an 8-device CPU backend, so this takes the direct path.
    assert graft._have_n_devices(8)
    graft.dryrun_multichip(8)


def test_dryrun_reexecs_when_devices_missing(monkeypatch):
    # Simulate the driver's single-real-TPU host: force the subprocess path.
    monkeypatch.setattr(graft, "_have_n_devices", lambda n: False)
    graft.dryrun_multichip(2)
