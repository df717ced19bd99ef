"""Real multi-process jax.distributed verification (VERDICT r1 #8).

Spawns two OS processes, each with 2 virtual CPU devices, wires them
through dist.multihost.initialize()'s env autodetect, and runs a global
computation over the (hosts=2, rows=2) hybrid mesh. This exercises the
coordination path that single-process simulated-mesh tests cannot.
"""

import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent(
    """
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpu_spmv.dist.multihost import initialize, make_hybrid_mesh, row_spec

    assert initialize() is True, "env autodetect failed"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local per process, global view

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_hybrid_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    sharding = NamedSharding(mesh, row_spec())
    vals = np.arange(8, dtype=np.float32)
    arr = jax.make_array_from_callback(
        (8,), sharding, lambda idx: vals[idx]
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(total) == 28.0, float(total)
    print(f"OK process {jax.process_index()}")
    """
)


def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            TPU_SPMV_COORDINATOR=f"127.0.0.1:{port}",
            TPU_SPMV_NUM_PROCESSES="2",
            TPU_SPMV_PROCESS_ID=str(pid),
            PYTHONPATH=os.pathsep.join(p for p in sys.path if p),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK process {i}" in out, out
