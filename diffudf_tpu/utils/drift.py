"""Platform-numerics fingerprint for result provenance.

The remote TPU service recompiles executables server-side, and its numerics
(fusion choices, `sin` implementations) move between service versions; 3000
chaotic training epochs amplify ULP-level differences into a different —
equally converged, differently noisy — minimum, so normal-consistency
endpoints of full runs carry a *platform-version band* (PERFORMANCE.md
"Platform numerics drift"; Chamfer is immune).

``fingerprint()`` makes the band observable in seconds: a deterministic
200-epoch stage-1 run on a synthetic sphere cloud whose final loss and
parameter checksum are bit-stable on a fixed platform version and shift
when the backend does.  ``scripts/drift_probe.py`` is the CLI wrapper;
``cli.quantitative`` stamps every results.csv with this record (sidecar
``results_provenance.json``) so committed quality numbers carry the service
version they were measured in.
"""

from __future__ import annotations

import datetime


def fingerprint(epochs: int = 200, batch: int = 30000) -> dict:
    """-> provenance record {date, platform, device, jax, final_loss, param_sum}."""
    import jax
    import numpy as np

    from ..config import TrainConfig
    from ..data.sampling import TrainingSampler
    from ..fields.siren import SirenSpec
    from ..train.loop import Trainer

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(20000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    normals = pts.copy()
    pts = (0.7 * pts).astype(np.float32)

    cfg = TrainConfig(
        num_epochs=epochs, s1_epochs=epochs, warmup_epochs=0,
        batch_size=batch, alpha=10.0, seed=123,
        lr_s1=1e-5, lr_s2=1e-7,
    )
    spec = SirenSpec(hidden=(256,) * 8)
    sampler = TrainingSampler.from_point_cloud(
        pts, normals, cfg.batch_size, cfg.sampling_percentiles
    )
    trainer = Trainer(spec, sampler, cfg)
    state, _, _ = trainer.run()
    leaves = jax.tree_util.tree_leaves(state.best_params)
    param_sum = float(
        sum(np.float64(np.asarray(l, np.float64).sum()) for l in leaves)
    )
    return {
        "date": datetime.date.today().isoformat(),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "epochs": epochs,
        "final_loss": float(state.best_loss),
        "param_sum": param_sum,
    }
