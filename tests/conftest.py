import os

# Force the CPU backend with 8 virtual devices: unit tests must not depend on
# TPU availability (the axon TPU emulates f64 and is reached over a tunnel),
# and sharding tests need a multi-device mesh.  Env vars alone are not enough
# (the axon jax plugin may initialise before conftest), so also set the
# platform through jax.config, which is honoured until the backend is used.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REFERENCE_INPUT = "/root/reference/input"


class Golden:
    """Lazy dict-style access to a golden fixture npz."""

    def __init__(self, path):
        self.z = np.load(path)

    def __getitem__(self, k):
        return self.z[k]

    def __contains__(self, k):
        return k in self.z.files

    @property
    def dims(self):
        ne, nr, ns, nl, ny = self.z["dims"]
        return int(ne), int(nr), int(ns), int(nl), int(ny)


@pytest.fixture(scope="session")
def golden_ccw():
    return Golden(os.path.join(GOLDEN_DIR, "ccw.npz"))


@pytest.fixture(scope="session")
def golden_qhh():
    return Golden(os.path.join(GOLDEN_DIR, "qhh.npz"))


@pytest.fixture(scope="session")
def golden_heihe():
    return Golden(os.path.join(GOLDEN_DIR, "heihe.npz"))


def _load_mesh(project):
    from shud_tpu.core.device import to_device
    from shud_tpu.core.mesh import build_mesh
    from shud_tpu.io.project import load_project

    base = os.path.dirname(REFERENCE_INPUT)
    inp = load_project(project, base=base)
    md = build_mesh(inp)
    return inp, md, to_device(md)


@pytest.fixture(scope="session")
def ccw():
    return _load_mesh("ccw")


@pytest.fixture(scope="session")
def qhh():
    return _load_mesh("qhh")


@pytest.fixture(scope="session")
def heihe():
    return _load_mesh("heihe")
