"""Golden tests: the quantitative evaluator vs the reference metric path.

Fixtures from ``scripts/build_reference_metrics.py``, which executes the
reference's own ``metrics()`` (AST-extracted from
``/root/reference/cuantitative.py:10-19``) over a plain-torch transcription
of ``pytorch3d.loss.chamfer_distance`` (the reference env's pinned metric
backend).  Pins Chamfer-L1, Chamfer-L2 and normal consistency — the judge
of every results/*.csv — including tie/degenerate/unnormalized-normal rows.
"""

import os.path as osp

import numpy as np
import pytest

from diffudf_tpu.eval.chamfer import chamfer_distance

GOLDEN = osp.join(osp.dirname(__file__), "golden", "metrics_golden.npz")

CASES = ("random", "sphere", "degenerate", "unnormalized")


@pytest.fixture(scope="module")
def golden():
    if not osp.exists(GOLDEN):
        pytest.skip("metrics_golden.npz not generated")
    return np.load(GOLDEN)


@pytest.mark.parametrize("backend", ["device", "host"])
@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("norm", [1, 2])
def test_chamfer_and_nc_match_reference(golden, case, norm, backend):
    verts = golden[f"{case}_verts"]
    vnorms = golden[f"{case}_vnorms"]
    pts = golden[f"{case}_pts"]
    pnorms = golden[f"{case}_pnorms"]

    if backend == "host":
        pytest.importorskip("scipy.spatial")
    cd, nc = chamfer_distance(verts, pts, vnorms, pnorms, norm=norm,
                              backend=backend)
    cd_ref = float(golden[f"{case}_cd_l{norm}"])
    nc_ref = float(golden[f"{case}_nc_l{norm}"])

    assert cd == pytest.approx(cd_ref, rel=2e-5), (case, norm)
    # NC goes through a normalize + gather; ties in NN can select a
    # different equidistant neighbour, so allow a hair more slack on the
    # tie-constructed case
    rel = 1e-4 if case == "degenerate" else 2e-5
    assert nc == pytest.approx(nc_ref, rel=rel, abs=1e-7), (case, norm)


def test_chamfer_without_normals(golden):
    verts = golden["random_verts"]
    pts = golden["random_pts"]
    cd, nc = chamfer_distance(verts, pts, norm=1)
    assert nc is None
    assert cd == pytest.approx(float(golden["random_cd_l1"]), rel=2e-5)
