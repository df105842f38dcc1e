"""Multi-host path (parallel/distributed.py), actually executed: two OS
processes join one jax.distributed run over local TCP (the DCN story on a
CPU stand-in — Gloo collectives) and reduce a globally-sharded array, so
``initialize``/``is_main_process`` are exercised rather than just written.
The reference's analogue is the dormant accelerate scaffolding
(``/root/reference/generate_data.py:825-830``) that the published scripts
never launch.
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
sys.path.insert(0, {repo!r})
from distdiff_tpu.parallel import distributed

distributed.initialize(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2
assert jax.process_index() == pid
assert distributed.is_main_process() == (pid == 0)

devs = np.array(jax.devices())
assert len(devs) == 2, devs  # one CPU device per process, global view
mesh = Mesh(devs, ("data",))

# each process contributes its own shard; the jitted reduction crosses the
# process boundary (GSPMD inserts the inter-host all-reduce)
x = jax.make_array_from_callback(
    (2, 4), NamedSharding(mesh, P("data")),
    lambda idx: np.full((1, 4), float(pid + 1), np.float32),
)
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(x)
val = float(total)
assert val == 12.0, val  # 4*1 + 4*2
print(f"proc{{pid}} psum-ok {{val}}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = tmp_path / "child.py"
    child.write_text(CHILD.format(repo=repo))

    env = dict(os.environ)
    # one real CPU device per process: drop the 8-virtual-device test flag
    env["XLA_FLAGS"] = ""
    env.pop("JAX_NUM_PROCESSES", None)

    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} psum-ok 12.0" in out, out
