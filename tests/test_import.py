"""Import-time hygiene: ``import osr_tpu`` must never initialize a JAX
backend.

On remote-TPU environments the backend connects through a tunnel; a
module-level device-array constant (e.g. ``jnp.float32(-inf)``) would
make every import — the CLI, host-only tools, doc builds — block on that
connection (observed: an unreachable tunnel hung ``python -m osr_tpu.cli``
before argument parsing). Backend initialization must wait until a
caller actually asks for devices, after it had a chance to pick the
platform (``osr_tpu.cli --platform cpu``).
"""

import subprocess
import sys


def test_import_initializes_no_jax_backend():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import osr_tpu\n"
        "import osr_tpu.ops.bm25, osr_tpu.parallel.sharded\n"
        "import osr_tpu.retrieval.fusion, osr_tpu.cli\n"
        "import jax._src.xla_bridge as xb\n"
        "backends = getattr(xb, '_backends', None)\n"
        "assert backends is not None, 'xla_bridge layout changed; re-check'\n"
        "assert not backends, f'backend initialized at import: {backends}'\n"
        "print('no-backend-ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "no-backend-ok" in out.stdout


def test_cli_platform_cpu_forces_cpu_devices():
    code = (
        "from osr_tpu import cli\n"
        "import jax\n"
        "rc = cli.main(['--platform', 'cpu', 'validate', '/nonexistent'])\n"
    )
    # 'validate' on a missing dir exits nonzero but must not touch jax;
    # the platform update itself must not raise after config parsing.
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert "is not in the list of known backends" not in out.stderr
    assert "Traceback" not in out.stderr or "SystemExit" in out.stderr, (
        out.stderr
    )
