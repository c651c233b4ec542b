"""True multi-process (process_count > 1) exercise of the multi-host path.

Spawns two OS processes that rendezvous through ``jax.distributed`` over
localhost with gloo CPU collectives (2 local CPU devices each -> a 4-device
global mesh) and checks:

- :func:`pccf.dist.mesh.host_batch_to_global` assembles per-host shards into
  one global array whose jitted global mean matches the full-batch value;
- rank-staggered dataset construction (``pccf.data.dataset._staggered_construct``)
  lets rank 0 warm the disk cache before rank 1 constructs — the TPU-native
  analogue of the reference's barriered DDP construction
  (reference src/data/dataset.py:37-54).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

N_PROC = 2
LOCAL_DEVICES = 2

WORKER = textwrap.dedent(
    """
    import os, sys, pathlib

    coord, pid, scratch = sys.argv[1], int(sys.argv[2]), pathlib.Path(sys.argv[3])
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=%d'
    )
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coord, num_processes=%d, process_id=pid)
    assert jax.process_count() == %d, jax.process_count()
    assert len(jax.devices()) == %d, len(jax.devices())

    import numpy as np
    from jax.sharding import Mesh
    from pccf.dist.mesh import DATA_AXIS, host_batch_to_global, is_main_process

    mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))

    # --- host-local -> global assembly + a jitted collective-backed reduce
    local = np.arange(%d, dtype=np.float32).reshape(%d, 1) + 100.0 * pid
    batch = {'x': local}
    global_batch = host_batch_to_global(batch, mesh)
    assert global_batch['x'].shape[0] == %d, global_batch['x'].shape
    mean = jax.jit(lambda b: b['x'].mean())(global_batch)
    expected = np.mean([np.arange(%d) + 100.0 * r for r in range(%d)])
    np.testing.assert_allclose(float(mean), expected, rtol=1e-6)

    # --- trailing batch that does NOT divide the dp axis: must be gathered
    # across hosts and genuinely replicated — identical contents everywhere,
    # not a P() stamp over host-divergent rows (SPMD invariant)
    tail = np.arange(3, dtype=np.float32).reshape(3, 1) + 100.0 * pid
    gtail = host_batch_to_global({'x': tail}, mesh)['x']
    assert gtail.shape[0] == 3 * %d, gtail.shape
    assert gtail.sharding.is_fully_replicated, gtail.sharding
    tmean = jax.jit(lambda b: b.mean())(gtail)
    texpected = np.mean([np.arange(3) + 100.0 * r for r in range(%d)])
    np.testing.assert_allclose(float(tmean), texpected, rtol=1e-6)

    # --- rank-staggered construction: rank 0 warms the cache behind a barrier
    from pccf.data.dataset import _staggered_construct

    class Creator:
        def __init__(self, cfg):
            marker = scratch / 'warm_cache'
            if not marker.exists():
                marker.write_text(f'built_by_rank_{jax.process_index()}')

    _staggered_construct(Creator, cfg=None)
    built_by = (scratch / 'warm_cache').read_text()
    assert built_by == 'built_by_rank_0', built_by

    print(f'WORKER{pid}: mean={float(mean):.3f} main={is_main_process()} OK')
    """
    % (
        LOCAL_DEVICES,
        N_PROC,
        N_PROC,
        N_PROC * LOCAL_DEVICES,
        LOCAL_DEVICES,
        LOCAL_DEVICES,
        N_PROC * LOCAL_DEVICES,
        LOCAL_DEVICES,
        N_PROC,
        N_PROC,
        N_PROC,
    )
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_and_staggered_construction(tmp_path):
    script = tmp_path / 'worker.py'
    script.write_text(WORKER)
    coord = f'localhost:{_free_port()}'
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'JAX_NUM_CPU_DEVICES')
    }
    env['JAX_CPU_COLLECTIVES_IMPLEMENTATION'] = 'gloo'
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for pid in range(N_PROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {pid} failed:\n{out}'
        assert f'WORKER{pid}:' in out and 'OK' in out, out
    assert 'main=True' in outs[0] and 'main=False' in outs[1]
