"""2-process jax.distributed CPU smoke (VERDICT r4 ask #7): launches
two real processes (gloo CPU collectives, local coordinator), each
owning one device of a global 2-device fleet, and checks that
(a) one data-sharded train step of the tiny Mask R-CNN executes with a
    finite, identical loss on both ranks, and
(b) the production eval result-collection path (pack → padded
    process_allgather → merge; swindet_tpu/apis/test.py:multi_gpu_test
    bookkeeping) round-trips every shard result to its dataset index.

This is the executable complement of the pure-function tests in
test_multihost_gather.py (reference: mmdet/apis/test.py:117-190)."""
import os
import os.path as osp
import socket
import subprocess
import sys

import pytest

WORKER = osp.join(osp.dirname(__file__), '_dist_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_smoke():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # don't inherit pytest's in-process xla flags
    env.pop('XLA_FLAGS', None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out.decode(errors='replace'))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'rank failed:\n{out[-4000:]}'
        assert 'DIST_SMOKE_OK' in out, out[-4000:]
    # both ranks computed the same global loss
    losses = {line.split('loss=')[1] for out in outs
              for line in out.splitlines() if 'DIST_SMOKE_OK' in line}
    assert len(losses) == 1, losses
