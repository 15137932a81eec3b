"""Full train() loop under multi-host: 2 local jax.distributed CPU
processes run 2 epochs end-to-end (per-process loader shards, SHARDED val
eval with cross-process confusion merge, pid-0-only checkpoint writes)
and must agree on the final val accuracy.

Round-4 additions (VERDICT r3 item 5):
- the first round trains with resident_frames=True, exercising the
  multi-host resident staging path (global buffers assembled with
  jax.make_array_from_process_local_data);
- after training, each child asserts the SHARDED eval (each process
  scores half the batches, merged by all-gather) returns bitwise the
  same loss and metrics as a full local eval of the same state;
- one extra train step is taken against a frame_sharding='shard'
  resident loader and must produce bitwise the same loss as the
  replicate-mode step from the same state (the u8 cross-process gather
  is exact).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ.pop("XLA_FLAGS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
import numpy as np
jax.config.update("jax_platforms", "cpu")
# Bitwise cross-process determinism requires every process to COMPILE the
# same program: the sandbox's persistent compilation cache can serve one
# process a foreign-machine AOT executable (cpu_aot_loader machine-feature
# warnings) whose float rounding differs by an ulp from a fresh compile.
jax.config.update("jax_enable_compilation_cache", False)
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id={pid})
from tracknetv3_tpu.config import TrainConfig
from tracknetv3_tpu.training.loop import train
cfg = TrainConfig(model_name="TrackNet", seq_len=3, epochs={epochs}, batch_size=4,
                  bg_mode="concat", save_dir={save_dir!r}, seed=5,
                  resume_training={resume}, input_hw=(32, 64),
                  resident_frames={resident})
res = train(cfg, data_dir={data_dir!r}, verbose_print=lambda *a: None)
print("MHTRAIN", {pid}, f"{{res['max_val_acc']:.10f}}", flush=True)

if {check_eval}:
    # Barrier: pid 0 writes TrackNet_cur.pt (train() flushes before
    # returning, but OTHER processes do not wait for it) - without this,
    # pid 1 can read the previous epoch's checkpoint and the two
    # processes would evaluate different states.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ckpt_flushed")

    # ---- sharded eval == full local eval, bitwise, on the same state ----
    from tracknetv3_tpu.data.dataset import (
        HeatmapBatchLoader, ResidentHeatmapLoader, build_split_index,
    )
    from tracknetv3_tpu.evaluation.loops import eval_tracknet
    from tracknetv3_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from tracknetv3_tpu.training.checkpoint import load_checkpoint
    from tracknetv3_tpu.training.optim import build_optimizer
    from tracknetv3_tpu.training.steps import (
        TrainState, create_train_state, make_tracknet_eval_step,
        make_tracknet_train_step,
    )

    ckpt = load_checkpoint(os.path.join({save_dir!r}, "TrackNet_cur.pt"))
    st = TrainState(params=ckpt["model"]["params"],
                    batch_stats=ckpt["model"]["batch_stats"],
                    opt_state=None, step=0)
    val_index = build_split_index({data_dir!r}, "val", 3, 3, "heatmap",
                                  input_hw=(32, 64))
    val_loader = HeatmapBatchLoader(val_index, "concat", 4, data_dir={data_dir!r})
    es = make_tracknet_eval_step("concat")
    l_full, m_full = eval_tracknet(st, es, val_loader, 4.0)
    l_sh, m_sh = eval_tracknet(st, es, val_loader, 4.0,
                               process_id=jax.process_index(), process_count=2)
    assert l_full == l_sh, (l_full, l_sh)
    assert m_full == m_sh, (m_full, m_sh)
    print("MHEVAL", {pid}, "OK", flush=True)

    # ---- resident 'shard' staging: bitwise-equal step loss ----
    train_index = build_split_index({data_dir!r}, "train", 3, 1, "heatmap",
                                    input_hw=(32, 64))
    mesh = make_mesh()
    tx = build_optimizer("Adam", 1e-3)
    losses = []
    for mode in ("replicate", "shard"):
        st0 = create_train_state(
            dict(params=ckpt["model"]["params"],
                 batch_stats=ckpt["model"]["batch_stats"]), tx)
        st0 = TrainState(*replicate_tree(tuple(st0), mesh))
        loader = ResidentHeatmapLoader(
            train_index, "concat", 4, shuffle=True, drop_last=True, seed=5,
            data_dir={data_dir!r}, mesh=mesh, frame_sharding=mode,
            process_id=jax.process_index(), process_count=2)
        assert loader.frame_sharding == mode
        batch = shard_batch(next(iter(loader)), mesh)
        step = make_tracknet_train_step(tx, "concat", alpha=-1)
        _, loss = step(st0, batch, jax.random.PRNGKey(3))
        losses.append(float(np.asarray(loss.addressable_shards[0].data)))
    assert losses[0] == losses[1], losses
    print("MHSHARD", {pid}, "OK", flush=True)
"""


def test_multihost_train_loop(tmp_path):
    from __graft_entry__ import _make_tiny_dataset

    data_dir = str(tmp_path / "data")
    _make_tiny_dataset(data_dir, splits=("train", "val"))
    save_dir = str(tmp_path / "exp")

    def run_round(epochs, resume, resident=False, check_eval=False):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        def spawn(pid):
            script = CHILD.format(repo=REPO, port=port, pid=pid,
                                  save_dir=save_dir, data_dir=data_dir,
                                  epochs=epochs, resume=resume,
                                  resident=resident, check_eval=check_eval)
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env["JAX_PLATFORMS"] = "cpu"
            return subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )

        procs = [spawn(0), spawn(1)]
        accs = {}
        outs = {}
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=1200)
            assert p.returncode == 0, f"child {i} rc={p.returncode}\n{err[-3000:]}"
            outs[i] = out
            for line in out.splitlines():
                if line.startswith("MHTRAIN"):
                    _, pid_s, acc = line.split()
                    accs[int(pid_s)] = float(acc)
        assert set(accs) == {0, 1}
        if check_eval:
            for i in (0, 1):
                assert f"MHEVAL {i} OK" in outs[i], outs[i]
                assert f"MHSHARD {i} OK" in outs[i], outs[i]
        return accs

    # Round 1: resident staging (multi-host make_array assembly) + the
    # sharded-eval and shard-staging invariance checks.
    accs = run_round(epochs=2, resume=False, resident=True, check_eval=True)
    # sharded eval, merged by all-gather: identical metrics on both
    assert accs[0] == accs[1], accs
    # pid 0 writes checkpoints; the loop must have produced both files
    assert os.path.exists(os.path.join(save_dir, "TrackNet_cur.pt"))
    assert os.path.exists(os.path.join(save_dir, "TrackNet_best.pt"))
    # both processes wrote their own scalar logs without clobbering
    assert os.path.isdir(os.path.join(save_dir, "logs"))
    assert os.path.isdir(os.path.join(save_dir, "logs_p1"))

    # Resume for one more epoch (host-loader path): the checkpointed
    # host-numpy state must be restored BEFORE mesh replication
    # (restore-after-replicate would hand the cross-process program
    # non-global arrays and fail at dispatch).
    accs2 = run_round(epochs=3, resume=True)
    assert accs2[0] == accs2[1], accs2
    assert accs2[0] >= accs[0] - 1e-9, (accs, accs2)
