"""Golden test: the FULL sphere-traced-image composition vs the reference.

Fixture from ``scripts/build_reference_st_image.py``: the reference's own
``create_projectional_image`` (``/root/reference/src/render_st.py:67-133``)
run on a committed sphere-fitted SIREN for three rendering variants.  This
pins the end-to-end stack — march, hit gathering, Hessian normals +
principal directions, shape-operator curvature, ray sign-alignment,
percentile-clipped RdYlBu colormap, Phong/Ward dispatch — as one
composition, beyond the piecewise suites.

The march runs in f32 parity mode (``fast_march: false`` — the default
mixed-bf16 march trades ≲1% step error for ~2× speed and flips silhouette
pixels); in parity mode the hit set matches the reference exactly and the
colors match to f32 precision.
"""

import json
import os.path as osp
import re

import numpy as np
import jax.numpy as jnp
import pytest

from diffudf_tpu.cli.generate_st import create_projectional_image
from diffudf_tpu.fields.siren import SirenSpec

GOLDEN = osp.join(osp.dirname(__file__), "golden", "st_image_golden.npz")

VARIANTS = ["phong_none", "phong_mean", "ward_gaussian"]


@pytest.fixture(scope="module")
def g():
    if not osp.exists(GOLDEN):
        pytest.skip("st_image_golden.npz not generated")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def field(g):
    n_layers = sum(1 for k in g.files if re.fullmatch(r"w\d+", k))
    params = [
        {"w": jnp.asarray(g[f"w{i}"]), "b": jnp.asarray(g[f"b{i}"])}
        for i in range(n_layers)
    ]
    hidden = tuple(g[f"w{i}"].shape[1] for i in range(n_layers - 1))
    return params, SirenSpec(hidden=hidden, w0=float(g["freq_w0"]))


def _configs(g):
    network_config = json.loads(bytes(g["network_config"]).decode())
    rendering_config = json.loads(bytes(g["rendering_config"]).decode())
    rendering_config["fast_march"] = False  # f32 reference-parity march
    return network_config, rendering_config


VARIANT_OVERRIDES = {
    "phong_none": {"reflection_method": "blinn-phong", "plot_curvatures": "none"},
    "phong_mean": {"reflection_method": "blinn-phong", "plot_curvatures": "mean"},
    "ward_gaussian": {"reflection_method": "ward", "plot_curvatures": "gaussian"},
}


@pytest.mark.parametrize("variant", VARIANTS)
def test_full_image_matches_reference(g, field, variant):
    params, spec = field
    network_config, rendering_config = _configs(g)
    rc = dict(rendering_config, **VARIANT_OVERRIDES[variant])

    colors = create_projectional_image(
        params, spec, g["rays"].copy(), g["t0"].copy(), g["mask"].copy(),
        network_config, rc,
    )
    colors = np.asarray(colors).reshape(-1, 3)
    ref = g[f"colors_{variant}"].reshape(-1, 3)

    err = np.abs(colors - ref).max(axis=1)
    # hit positions agree to f32 march precision; percentile-clipped
    # curvature normalisation divides by a small range, hence the
    # per-pixel slack; the bulk must be much tighter
    assert float(err.max()) < 5e-3, (variant, float(err.max()))
    assert float(np.quantile(err, 0.99)) < 1e-3, (
        variant, float(np.quantile(err, 0.99)))


def test_hits_match_reference(g, field):
    """The march converges the same pixel set (up to boundary flips)."""
    from diffudf_tpu.render.tracer import trace_rays_compacted

    params, spec = field
    network_config, rendering_config = _configs(g)
    _, hits, _ = trace_rays_compacted(
        params, spec, g["t0"].copy(), g["rays"].copy(), g["mask"].copy(),
        gt_mode=network_config["gt_mode"], alpha=network_config["alpha"],
        surface_threshold=rendering_config["surface_threshold"],
        max_iterations=rendering_config["max_iterations"],
        fast=False,
    )
    hits = np.asarray(hits).astype(bool)
    ref_hits = g["hits"].astype(bool)
    assert (hits == ref_hits).all(), (
        int((hits != ref_hits).sum()), int(ref_hits.sum()), int(hits.sum()))
