"""Generate golden fixtures for the NDF-style point-cloud extraction from
the REFERENCE implementation (``src/render_pc.py``).

Pins ``Sampler.generate_point_cloud``'s projection dynamics
(``render_pc.py:26-73``) on the seeded SIREN used by the other golden
builders: ``num_steps`` iterations of ``x ← x − inverse(f)·∇̂f`` with
``min_step=0`` (``:50-53``), the in-domain & step<threshold keep mask
(``:55-56``), and the Hessian-top-eigenvector normals of tanh mode
(``:64``).

Two reference quirks the fixture captures faithfully:

  * the field value is fed to ``inverse`` RAW (no ``abs``,
    ``render_pc.py:50`` vs ``render_mc.py:71``): a negative prediction
    puts ``sqrt(f/α)`` at NaN, so that sample silently drops out of the
    in-domain mask.  Finite output rows are therefore exactly the rows
    whose field value stayed positive at every step — on those rows the
    rebuild's ``|f|`` (documented deviation, ``pc/sampler.py``) follows
    the identical trajectory, which is what the test compares.
  * ``evaluate`` runs twice per projection step (``:46-50``) — pure
    waste, identical values; the fixture is computed with the real
    method so this is exercised, and an inline transcription is checked
    bit-exact against the method's masked output before saving.

Committed as ``tests/golden/pc_golden.npz`` for ``tests/test_golden_pc.py``.

    python scripts/build_reference_pc.py
"""

import ast
import os.path as osp
import sys
import textwrap
import types
import warnings

import numpy as np
import torch

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "tests", "golden")
sys.path.insert(0, "/root/reference")

from src.inverses import inverse  # noqa: E402
from src.model import SIREN  # noqa: E402
from src.util import normalize  # noqa: E402

NUM_POINTS = 256
NUM_STEPS = 3
ALPHA = 10.0
SEED = 5


def extract_defs(path, names):
    with open(path) as fh:
        src = fh.read()
    tree = ast.parse(src)
    found = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in names:
            seg = ast.get_source_segment(src, node)
            seg = seg.replace("torch.device(0)", "torch.device('cpu')")
            found[node.name] = textwrap.dedent(seg.replace("np.bool8", "np.bool_"))
    missing = set(names) - set(found)
    if missing:
        raise RuntimeError(f"not found in {path}: {missing}")
    return found


def load_evaluate_chunked():
    from src.diff_operators import gradient, hessian

    ns = {"torch": torch, "np": np, "gradient": gradient, "hessian": hessian}
    exec(extract_defs("/root/reference/src/evaluate.py", ["evaluate"])["evaluate"], ns)
    return ns["evaluate"]


def main():
    torch.manual_seed(71)
    model = SIREN(3, 1, [32, 32], w0=30)
    model.eval()
    # same head shrink as build_reference_grid_rays.py, plus a positive
    # bias shift so the raw field is mostly positive (UDF-like): the
    # reference feeds f to inverse() UN-abs'd, so a zero-mean random field
    # NaNs every trajectory at the first sqrt.  0.12 straddles the 1/α=0.1
    # branch point of inv_tanh, exercising both branches.
    with torch.no_grad():
        head = [m for m in model.modules() if isinstance(m, torch.nn.Linear)][-1]
        head.weight *= 0.1
        head.bias *= 0.1
        head.bias += 0.12

    out = {}
    linears = [m for m in model.modules() if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        out[f"w{i}"] = lin.weight.detach().numpy().T.copy()
        out[f"b{i}"] = lin.bias.detach().numpy().copy()
    out["freq_w0"] = np.int64(30)
    out["alpha"] = np.float32(ALPHA)
    out["num_steps"] = np.int64(NUM_STEPS)

    evaluate = load_evaluate_chunked()
    device = torch.device("cpu")

    # --- the real method (render_pc.py:26-73), one iteration ---------------
    method_src = extract_defs(
        "/root/reference/src/render_pc.py", ["generate_point_cloud"]
    )["generate_point_cloud"]
    ns = {"torch": torch, "np": np, "evaluate": evaluate, "inverse": inverse,
          "normalize": normalize, "warnings": warnings,
          "tqdm": types.SimpleNamespace(tqdm=lambda x: x)}
    exec(method_src, ns)
    fake_self = types.SimpleNamespace(decoder=model, device=device)

    np.random.seed(SEED)
    samples0 = np.random.uniform(-1, 1, (NUM_POINTS, 3))
    out["samples0"] = samples0.astype(np.float32)

    np.random.seed(SEED)  # the method re-draws exactly samples0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        ref_pts, ref_nrm = ns["generate_point_cloud"](
            fake_self, "tanh", ALPHA, num_steps=NUM_STEPS,
            num_points=NUM_POINTS, surf_thresh=np.inf, max_iter=1,
        )

    # --- inline transcription for the FULL (unmasked) arrays ---------------
    samples = samples0.copy()
    gradients = np.zeros((NUM_POINTS, 3))
    for step_i in range(NUM_STEPS):
        if step_i == NUM_STEPS - 1:
            hessians = np.zeros((NUM_POINTS, 3, 3))
            evaluate(model, samples, gradients=gradients, hessians=hessians,
                     device=device)
        udfs = evaluate(model, samples, gradients=gradients, device=device)
        with np.errstate(invalid="ignore"):
            steps = inverse("tanh", udfs, ALPHA, min_step=0)
            samples -= steps * normalize(gradients)
    with np.errstate(invalid="ignore"):
        mask = np.prod(
            np.logical_and(samples >= -1, samples <= 1), axis=1
        ).astype(bool)
        mask &= steps.flatten() < np.inf
    # eigh only where the trajectory stayed finite (the method only ever
    # eighs masked rows, render_pc.py:64); NaN elsewhere
    normals_full = np.full((NUM_POINTS, 3), np.nan)
    for i, h in enumerate(hessians):
        if np.isfinite(h).all():
            normals_full[i] = np.linalg.eigh(h)[1][:, 2]

    # self-check: transcription == method on the masked rows
    np.testing.assert_array_equal(samples[mask], ref_pts)
    np.testing.assert_array_equal(normals_full[mask], ref_nrm)

    out["positions"] = samples.astype(np.float32)  # NaN on negative-f rows
    out["last_steps"] = steps.flatten().astype(np.float32)
    out["keep_mask"] = mask
    out["normals"] = normals_full.astype(np.float32)

    path = osp.join(GOLDEN, "pc_golden.npz")
    np.savez_compressed(path, **out)
    finite = np.isfinite(samples).all(axis=1)
    print(f"wrote {path}: kept={int(mask.sum())}/{NUM_POINTS}, "
          f"finite={int(finite.sum())}")


if __name__ == "__main__":
    main()
