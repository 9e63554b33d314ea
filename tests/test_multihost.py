"""Multi-process (multi-host) mechanics: the jax.distributed path.

Spawns the real 2-process launcher (`scripts/bench_scaling_multihost.py`):
two OS processes join a gRPC coordinator via
`jax.distributed.initialize`, build ONE global (host, env) mesh, and run
the CBF-filtered rollout jitted over it with a genuine cross-host
collective per step. Tiny sizes — this asserts the multi-process path
works end-to-end, not a performance number (the committed
SCALING_r03.json holds the measured weak-scaling efficiency).
"""

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_global_mesh_rollout():
    env = dict(os.environ)
    # The launcher sets its own platform flags per worker.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(_ROOT, "scripts", "bench_scaling_multihost.py"),
            "--hosts", "2", "--devices_per_host", "1",
            "--per_device_batch", "8", "--n_agents", "4",
            "--steps", "4", "--chunks", "1",
        ],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    assert summary["results"][1]["hosts"] == 2
    assert summary["results"][1]["global_devices"] == 2
    assert summary["results"][1]["batch"] == 16
    assert summary["results"][1]["steps_per_s"] > 0
