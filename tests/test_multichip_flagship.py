"""Flagship-scale multi-device validation (round-5, VERDICT #2).

Runs the SAME content as ``__graft_entry__._dryrun_flagship`` on the
suite's virtual 8-device CPU mesh: the real 8×256 / 30k-batch s1+s2
chunks with a DP-vs-single-device loss-equivalence assert, a sharded
sparse N=128 extraction, and render-scale tracer/projector calls.

Slow (~5-10 min on the 1-core CI box — the s1 union-batch reference loss
alone is ~1 TFLOP); marked ``flagship`` so a quick pass can deselect it
with ``-m "not flagship"``.
"""

import os.path as osp
import sys

import jax
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


@pytest.mark.flagship
def test_flagship_multichip_dryrun():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8, "conftest should provide the 8-dev mesh"
    g._dryrun_flagship(8)
