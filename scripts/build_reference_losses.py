"""Generate golden fixtures for field/loss/inverse parity from the REFERENCE.

Imports the reference's actual torch modules (``src/model.py``,
``src/loss_functions.py``, ``src/diff_operators.py``, ``src/inverses.py``
— all torch+numpy only, importable on CPU) and records, for a seeded
SIREN and a seeded mixed on/off-surface batch:

  * the SIREN forward values, gradients and Hessians,
  * dif.mean_curvature and dif.principal_directions,
  * every term of loss_s1 / loss_s2 / loss_siren (the training objective),
  * inverse(gt_mode, ·, alpha) for all three gt modes,

plus the layer weights, so ``tests/test_golden_losses.py`` can rebuild the
identical field in the rebuild's pytree layout and compare — pinning model
semantics, autodiff, loss terms and distance inverses against the
reference implementation itself rather than a re-derivation.

    python scripts/build_reference_losses.py
"""

import os.path as osp
import sys

import numpy as np
import torch

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "tests", "golden")
sys.path.insert(0, "/root/reference")

from src import diff_operators as dif  # noqa: E402
from src import inverses  # noqa: E402
from src import loss_functions as lf  # noqa: E402
from src.model import SIREN  # noqa: E402


def main():
    torch.manual_seed(71)
    np.random.seed(71)
    hidden = [32, 32]
    w0 = 30
    model = SIREN(3, 1, hidden, w0=w0)
    model.eval()

    # ordered Linear layers -> npz arrays (torch Linear weight is (out, in))
    linears = [m for m in model.modules() if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(hidden) + 1, [type(m) for m in model.modules()]
    layers = {}
    for i, lin in enumerate(linears):
        layers[f"w{i}"] = lin.weight.detach().numpy().T.copy()  # (in, out)
        layers[f"b{i}"] = lin.bias.detach().numpy().copy()

    B, n_on = 256, 100
    rng = np.random.default_rng(71)
    pts = rng.uniform(-1.0, 1.0, size=(1, B, 3)).astype(np.float32)
    normals = np.zeros((1, B, 3), np.float32)
    nrm = rng.normal(size=(n_on, 3))
    normals[0, :n_on] = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True))
    sdf = np.zeros((1, B, 1), np.float32)
    # off-surface rows: signed distances (mesh-mode contract) incl. negatives
    sdf[0, n_on:, 0] = rng.uniform(-0.8, 0.8, size=B - n_on)
    alpha = 10.0

    coords = torch.from_numpy(pts)
    gt = {"sdf": torch.from_numpy(sdf), "normals": torch.from_numpy(normals)}

    out = dict(layers)
    out.update(pts=pts, normals=normals, sdf=sdf,
               alpha=np.float32(alpha), freq_w0=np.int64(w0))

    # --- raw field quantities -------------------------------------------
    mo = model(coords)
    f = mo["model_out"]
    x = mo["model_in"]
    grad = dif.gradient(f, x)
    hess = dif.hessian(f.squeeze(-1), x)
    out["f"] = f.detach().numpy()[0, :, 0]
    out["grad"] = grad.detach().numpy()[0]
    out["hess"] = hess.detach().numpy()[0]
    out["mean_curv"] = dif.mean_curvature(f, x).detach().numpy()[0, :, 0]
    # dif.principal_directions is dead code in the reference (no caller;
    # the render path takes directions from Hessian eigenvectors instead)
    # and its fancy-indexing broadcasts into (1,B,B) garbage on batched
    # inputs — it is only well-formed one point at a time ((3,), (3,3)),
    # so evaluate it per point to record its intended semantics
    p1 = np.zeros((B, 3), np.float32)
    p2 = np.zeros((B, 3), np.float32)
    gd, hd = grad.detach()[0], hess.detach()[0]
    for i in range(B):
        t1, t2 = dif.principal_directions(gd[i], hd[i])
        p1[i] = t1[:3].numpy()
        p2[i] = t2[:3].numpy()
    out["pdir1"] = p1
    out["pdir2"] = p2

    # --- loss terms ------------------------------------------------------
    s1_w = [1e4, 1e4, 1e4, 1e3]
    s2_w = [1e5, 1e5]
    siren_w = [3e3, 1e2, 1e2, 5e1]
    for name, terms in [
        ("s1", lf.loss_s1(model, coords, gt, s1_w, alpha)),
        ("s2", lf.loss_s2(model, coords, gt, s2_w, alpha)),
        ("siren", lf.loss_siren(model, coords, gt, siren_w)),
    ]:
        for k, v in terms.items():
            out[f"loss_{name}_{k}"] = np.float64(v.detach().item())
    out["s1_weights"] = np.asarray(s1_w, np.float64)
    out["s2_weights"] = np.asarray(s2_w, np.float64)
    out["siren_weights"] = np.asarray(siren_w, np.float64)

    # --- inverse distance maps ------------------------------------------
    vals = rng.uniform(0.0, 0.9, size=4096).astype(np.float32)
    vals[:8] = [0.0, 1e-6, 0.005, 0.0099, 0.01, 0.0101, 0.099, 0.5]
    out["inverse_vals"] = vals
    # negatives for squared/siren (pin the min_step fill semantics); the
    # reference's tanh branch NaNs on negatives (documented deviation)
    neg = vals.copy()
    neg[:64] = -np.abs(rng.uniform(0.01, 0.5, size=64).astype(np.float32))
    out["inverse_vals_neg"] = neg
    for mode in ("tanh", "squared", "siren"):
        out[f"inverse_{mode}"] = inverses.inverse(mode, vals, alpha)
    for mode in ("squared", "siren"):
        out[f"inverse_{mode}_neg"] = inverses.inverse(mode, neg, alpha)

    path = osp.join(GOLDEN, "field_losses_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    main()
