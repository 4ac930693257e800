"""Test environment: virtual 8-device CPU mesh (SURVEY.md §7.4).

Multi-chip sharding programs (the real ``shard_map`` code paths) run in CI on
8 forced CPU host devices; real-TPU runs are reserved for benchmarks. Must
configure the environment before jax initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["VROD_PLATFORM"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin hooks interpreter startup via a sitecustomize on
# PYTHONPATH and OVERRIDES jax_platforms to "axon,cpu", clobbering the
# JAX_PLATFORMS=cpu above — so the first jax.devices() call initializes
# the axon backend, and a DEAD tunnel then hangs the whole suite in the
# plugin's connect-retry loop (observed when the tunnel proxy went
# down). Tests are CPU-only by design: scrub the plugin from PYTHONPATH
# so SUBPROCESS tests (fault-injection, multihost) never load it, and
# force the platforms config back to cpu in THIS process (registration
# already happened at interpreter startup; only initialization matters).
def _is_axon_plugin_dir(p: str) -> bool:
    # Match only the plugin's install dirs (".axon_site" sitecustomize dir,
    # or a directory literally named "axon"), not any path that merely
    # contains the substring (e.g. /home/saxon/...).
    base = os.path.basename(p.rstrip("/"))
    return base in (".axon_site", "axon")


sys.path[:] = [p for p in sys.path if not _is_axon_plugin_dir(p)]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if not _is_axon_plugin_dir(p))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Belt and braces: pin default placement to CPU so jit/pallas-interpret
# paths never route through a TPU backend during tests.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def tmp_db(tmp_path):
    from vrod_tpu.database import Database
    db = Database.new(tmp_path, "testdb")
    yield db
    db.close()


def numpy_topk_oracle(vectors, live_idx, queries, k, metric):
    """Brute-force f64 oracle: exact top-k ids (as sets per rank cutoff)."""
    v = vectors[live_idx].astype(np.float64)
    q = queries.astype(np.float64)
    if metric == "cosine":
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        s = qn @ vn.T
        order = np.argsort(-s, axis=1, kind="stable")
    elif metric == "dot":
        s = q @ v.T
        order = np.argsort(-s, axis=1, kind="stable")
    elif metric == "l2":
        s = ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        order = np.argsort(s, axis=1, kind="stable")
    else:
        raise ValueError(metric)
    kk = min(k, len(live_idx))
    return np.asarray(live_idx)[order[:, :kk]], np.take_along_axis(
        s, order[:, :kk], axis=1)
