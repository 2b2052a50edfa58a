"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this lives at the
top of conftest.  Real-TPU behaviour is exercised by bench.py and the driver,
not by the unit suite.
"""

import os

# Env vars alone are not enough: pytest plugins may import jax before this
# conftest runs, after which JAX_PLATFORMS is already latched.  jax.config
# updates work any time before backend initialisation.
os.environ["JAX_PLATFORMS"] = "cpu"

# 8 virtual CPU devices share this box's (possibly single) core, so an
# 8-participant collective is 8 *threads* rendezvousing — under load a thread
# can miss XLA's CPU rendezvous deadline and rendezvous.cc abort()s the whole
# process (observed as pytest exit 134 mid-suite).  Raise the termination
# deadline far above any realistic scheduling delay; XLA_FLAGS is read at
# backend initialisation, which happens after conftest even when a pytest
# plugin imported jax first.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

import faulthandler  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _hang_watchdog():
    """Per-test deadlock backstop (pytest-timeout is not in the image).

    Two timers per test, both owned HERE (faulthandler has a single
    global timer, so pyproject's ``faulthandler_timeout`` would be
    silently clobbered by this fixture — it is intentionally not set):

      * 900 s: non-fatal all-thread traceback dump via threading.Timer —
        makes a straggling test diagnosable without killing the run (the
        ``flagship``-marked test legitimately runs ~5-10 min under load;
        anything else past 15 min is news);
      * 1800 s: hard exit via faulthandler.dump_traceback_later.  The XLA
        collective deadline above already aborts a stuck CPU rendezvous
        at 900 s; this catches everything else (host-side deadlock,
        runaway compile) instead of hanging the suite indefinitely.
        30 min: a legitimate test can ride out one full 900 s collective
        straggler plus its normal work and still clear this with margin.
    """
    import threading

    diag = threading.Timer(900.0, faulthandler.dump_traceback)
    diag.daemon = True
    diag.start()
    faulthandler.dump_traceback_later(1800, exit=True)
    yield
    diag.cancel()
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture
def rng():
    return np.random.default_rng(123)


@pytest.fixture
def key():
    return jax.random.PRNGKey(123)


@pytest.fixture(scope="session")
def trained_sphere():
    """A small SIREN fitted to the tanh-UDF of a sphere (r=0.7, α=10).

    Session-scoped: trained once, shared by render / pc / integration tests.
    Returns (params, spec, radius, alpha).
    """
    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.sampling import TrainingSampler
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.train.loop import Trainer

    r, alpha = 0.7, 10.0
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= r
    cfg = TrainConfig(
        num_epochs=300, s1_epochs=300, warmup_epochs=20,
        warmup_lr=1e-4, lr_s1=1e-4, lr_s2=1e-6,
        batch_size=512, alpha=alpha,
    )
    spec = SirenSpec(hidden=(64, 64, 64))
    sampler = TrainingSampler.from_point_cloud(
        pts, pts / r, cfg.batch_size, cfg.sampling_percentiles
    )
    trainer = Trainer(spec, sampler, cfg)
    state, losses, _ = trainer.run(chunk_size=100)
    return state.best_params, spec, r, alpha
