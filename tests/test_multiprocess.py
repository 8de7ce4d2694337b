"""TRUE multi-process distributed integration (VERDICT r1 item 5): two OS
processes run jax.distributed.initialize over a gRPC coordinator + Gloo
CPU collectives, drive the host-coordinated domain batcher +
make_array_from_process_local_data + the pjit-ed train step, and must
produce losses identical to each other AND to a single-process run of the
same global schedule. This is the only place the §2.7 multi-host claims
execute for real (test_distributed.py simulates process indices inside one
process)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if n_proc > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_proc, process_id=pid)
else:
    # single-process comparison run still uses 4 devices for the same mesh
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax.numpy as jnp
import numpy as np

from aread_tpu.config import Config
from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.parallel.distributed import HostShardedDomainBatcher
from aread_tpu.parallel.mesh import make_mesh
from aread_tpu.parallel.train_step import make_sharded_train_step, shard_params
from aread_tpu.train.trainer import make_optimizer

assert len(jax.devices()) == 4, jax.devices()
mesh = make_mesh(data=4, model=1)

# every process derives the identical data/model/params from the seed
data = make_synthetic_data(n_rows=1024, n_domain=3, vocab=64, seed=0)
model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,), dropout=0.0)
x0 = jnp.asarray(data.train_x[:8])
variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(0)}, x0)
params, state = dict(variables["params"]), {
    k: v for k, v in variables.items() if k != "params"}
optimizer = make_optimizer(1e-2, 1e-8)
params, _ = shard_params(params, mesh)
opt_state = optimizer.init(params)
step, _ = make_sharded_train_step(model, optimizer, mesh,
                                  type(model).REG_RULES, False)

batcher = HostShardedDomainBatcher(
    data.train_x, data.train_y.astype(np.float32), global_bs=64,
    domain_idx=data.spec.domain_idx, n_domain=data.n_domain,
    process_index=pid, process_count=n_proc, seed=3)

losses = []
for i, d in enumerate(batcher.domain_batch_seq[:5]):
    batch = batcher.device_batch(d, mesh)
    params, state, opt_state, loss = step(params, state, opt_state, batch,
                                          jax.random.PRNGKey(100 + i))
    losses.append(float(loss))
print("LOSSES", " ".join(f"{l:.8f}" for l in losses), flush=True)
'''


WORKER_MODEL_AXIS = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if n_proc > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_proc, process_id=pid)
else:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import dataclasses
import hashlib
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from aread_tpu.config import Config
from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.aread import AREAD
from aread_tpu.train.hemp import AREADTrainer

assert len(jax.devices()) == 4, jax.devices()
# (2 data x 2 model) with the MODEL axis crossing the process boundary:
# global devices [0,1] live on process 0, [2,3] on process 1; the
# transposed reshape puts (dev0, dev2) on one model row — so the
# row-sharded table, the a2a id buckets and the sharded sparse-Adam
# shards all straddle the two OS processes.
mesh = Mesh(np.array(jax.devices()).reshape(2, 2).T, ("data", "model"))

embed_dim, data_axis, model_axis = 8, 2, 2
bs = 32 * data_axis
data = make_synthetic_data(n_rows=16 * bs, n_domain=4, vocab=64, seed=0)
spec = data.spec.pad_vocab((128 // embed_dim) * model_axis)
spec = spec.with_flat_table(embed_dim)
data = dataclasses.replace(data, spec=spec)
model = AREAD(spec=spec, embed_dim=embed_dim, n_tower=(3, 6, 12),
              n_domain=4, base_model="mmoe", expert_dims=(32, 16),
              tower_dims=((16, 8), (8, 8), (8, 8)), mmoe_n_expert=4)
# dryrun_multichip's production-shaped HEMP fit config, plus the a2a
# exchange (auto-calibrated capacity) so the id buckets cross processes
cfg = Config(bs=bs, embed_dim=embed_dim, epoch=1, warm_up_interval=1,
             regroup_interval=max(1, 8 * bs // 1024), candidate_mask_num=1,
             regroup_update_step=1, regroup_eval_step=1,
             streaming_eval=True, seed=0, embed_lookup="a2a")
trainer = AREADTrainer(model, cfg, data.n_domain, mesh=mesh)
res = trainer.fit(data, epochs=1, verbose=False)
masks = trainer.mask_state.domain_mask
mask_hash = hashlib.sha1(b"".join(
    np.asarray(m, bool).tobytes() for dm in masks if dm is not None
    for m in dm)).hexdigest()[:16]
print("RESULT",
      f"{res['history'][-1]['train_loss']:.8f}",
      f"{res['test']['total_auc']:.8f}",
      trainer.regroup_times, mask_hash, flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(stdout):
    for line in stdout.splitlines():
        if line.startswith("LOSSES"):
            return [float(v) for v in line.split()[1:]]
    return None


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_training_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=REPO)

    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"proc {i}:\n{err[-3000:]}"
        outs.append(_parse(out))
        assert outs[-1] is not None, out

    # SPMD: both processes computed the same global losses
    np.testing.assert_array_equal(outs[0], outs[1])

    # and they equal the single-process run of the same schedule
    single = subprocess.run(
        [sys.executable, str(script), "0", "1", "0"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert single.returncode == 0, single.stderr[-3000:]
    want = _parse(single.stdout)
    np.testing.assert_allclose(outs[0], want, rtol=1e-5, atol=1e-7)


def _parse_result(stdout):
    for line in stdout.splitlines():
        if line.startswith("RESULT"):
            parts = line.split()
            return (float(parts[1]), float(parts[2]), int(parts[3]),
                    parts[4])
    return None


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_model_axis_full_fit(tmp_path):
    """VERDICT r4 item 2: a TRUE (2 data x 2 model) mesh across 2 OS
    processes with the MODEL axis straddling the process boundary — the
    row-sharded table, the a2a embedding exchange, the shard_map'd sparse
    Adam and a HEMP mask evolution all execute cross-process inside a
    full AREADTrainer.fit. Both processes must agree bitwise on losses/
    masks, at least one evolution must fire, and the run must match the
    single-process 4-device execution of the same schedule."""
    script = tmp_path / "worker_model_axis.py"
    script.write_text(WORKER_MODEL_AXIS)
    env = dict(os.environ, PYTHONPATH=REPO)

    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"proc {i}:\n{err[-4000:]}"
        outs.append(_parse_result(out))
        assert outs[-1] is not None, out

    # SPMD: identical losses, AUC, regroup count and SELECTED MASKS
    assert outs[0] == outs[1], (outs[0], outs[1])
    loss2, auc2, regroups2, mask2 = outs[0]
    assert np.isfinite(loss2) and np.isfinite(auc2)
    assert regroups2 >= 1, "HEMP evolution never fired cross-process"

    # single-process 4-device run of the same schedule agrees
    single = subprocess.run(
        [sys.executable, str(script), "0", "1", "0"],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env)
    assert single.returncode == 0, single.stderr[-4000:]
    loss1, auc1, regroups1, mask1 = _parse_result(single.stdout)
    assert regroups1 == regroups2
    assert mask1 == mask2, "evolved masks diverged across process counts"
    np.testing.assert_allclose(loss2, loss1, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(auc2, auc1, rtol=1e-5, atol=1e-7)
