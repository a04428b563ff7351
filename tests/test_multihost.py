"""Replica-consistency checks (reference misc.check_ddp_consistency,
torch_utils/misc.py:202): local multi-device variant on the CPU mesh, and the
real multi-process path over a 2-process CPU `jax.distributed` cluster."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from invertavatar_tpu.parallel.mesh import make_mesh
from invertavatar_tpu.parallel.multihost import check_replica_consistency_local


def test_replica_consistency_local():
    mesh = make_mesh()
    rep = NamedSharding(mesh, P())
    params = {
        "w": jax.device_put(jnp.arange(16.0).reshape(4, 4), rep),
        "b": jax.device_put(jnp.ones((8,)), rep),
    }
    check_replica_consistency_local(params)  # replicated -> passes

    # a deliberately divergent "replicated" array: build from per-device
    # distinct shards via make_array_from_single_device_arrays
    devs = mesh.devices.reshape(-1)
    shards = [
        jax.device_put(jnp.full((4, 4), float(i)), d) for i, d in enumerate(devs)
    ]
    bad = jax.make_array_from_single_device_arrays(
        (4, 4), rep, shards
    )
    with pytest.raises(AssertionError):
        check_replica_consistency_local({"w": bad})


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp

    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address=sys.argv[2], num_processes=2, process_id=pid
    )
    from invertavatar_tpu.parallel.multihost import check_replica_consistency

    params = {{"w": np.arange(8.0), "b": np.ones((3,))}}
    check_replica_consistency(params)  # identical -> passes
    print("CONSISTENT_OK", flush=True)

    params["w"] = params["w"] + (0.5 if pid == 1 else 0.0)
    try:
        check_replica_consistency(params)
        print("MISSED_DIVERGENCE", flush=True)
    except AssertionError:
        print("CAUGHT_DIVERGENCE", flush=True)
    """
)


@pytest.mark.slow
def test_replica_consistency_multiprocess(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        assert "CONSISTENT_OK" in out
        assert "CAUGHT_DIVERGENCE" in out, out
