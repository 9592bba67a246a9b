"""Two-process jax.distributed smoke test for the DCN layer
(cha1_mcmc_tpu/parallel/multihost.py).

Real multi-host TPU hardware is unavailable here, so the distributed
runtime is exercised the honest way that *is* available: two local
processes on the CPU backend, a coordinator on localhost, and the full
initialize -> global-device-visibility -> disjoint-work-assignment path.
Matches SURVEY §5 "distributed communication backend".
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from cha1_mcmc_tpu.parallel.multihost import (initialize_multihost,
                                              host_molecule_assignment)

pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
idx, cnt = initialize_multihost(addr, num_processes=n, process_id=pid)
assert (idx, cnt) == (pid, n), (idx, cnt)
# every process sees the *global* device set over DCN
assert jax.device_count() == 2 * n, jax.device_count()
assert len(jax.local_devices()) == 2

mine = host_molecule_assignment(["hc5n", "hc7n", "hc9n", "benzonitrile",
                                 "cyanonaphthalene"], idx, cnt)
print("ASSIGNED", idx, ",".join(mine), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)  # CPU compiles stay local
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(pid), "2", addr],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    assigned = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("ASSIGNED"):
                _, idx, mols = line.split(" ", 2)
                assigned[int(idx)] = set(mols.split(","))
    assert set(assigned) == {0, 1}
    # round-robin assignment is disjoint and covering
    assert assigned[0] & assigned[1] == set()
    assert assigned[0] | assigned[1] == {
        "hc5n", "hc7n", "hc9n", "benzonitrile", "cyanonaphthalene"}
