"""Importing crlot_tpu must NOT initialize the JAX backend.

Regression guard: a module-level `jnp.<scalar>(...)` or any other
device-array creation at import time initializes XLA, which breaks
`jax.distributed.initialize()` in multihost children (it must run before
ANY backend-touching call — see tests/multihost_child.py). Caught live:
align.py once held `_BIG = jnp.float32(3e38)` at module scope.

Runs in a subprocess because the parent test process has long since
initialized its backend.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import os
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
import crlot_tpu  # the import under test
from jax._src import xla_bridge
sys.exit(1 if xla_bridge._backends else 0)
"""


def test_package_import_does_not_initialize_backend():
    r = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=REPO)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, (
        "importing crlot_tpu initialized the XLA backend "
        "(module-level device-array creation?)\n" + r.stderr[-2000:]
    )
