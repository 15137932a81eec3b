"""Full train() loop under multi-host: 2 local jax.distributed CPU
processes run 2 epochs end-to-end (per-process loader shards, replicated
eval via local state replicas, pid-0-only checkpoint writes) and must
agree on the final val accuracy.
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
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id={pid})
from tracknetv3_tpu.config import TrainConfig
from tracknetv3_tpu.training.loop import train
cfg = TrainConfig(model_name="TrackNet", seq_len=3, epochs={epochs}, batch_size=4,
                  bg_mode="concat", save_dir={save_dir!r}, seed=5,
                  resume_training={resume}, input_hw=(32, 64))
res = train(cfg, data_dir={data_dir!r}, verbose_print=lambda *a: None)
print("MHTRAIN", {pid}, f"{{res['max_val_acc']:.10f}}", flush=True)
"""


def test_multihost_train_loop(tmp_path):
    from __graft_entry__ import _make_tiny_dataset

    data_dir = str(tmp_path / "data")
    _make_tiny_dataset(data_dir, splits=("train", "val"))
    save_dir = str(tmp_path / "exp")

    def run_round(epochs, resume):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        def spawn(pid):
            script = CHILD.format(repo=REPO, port=port, pid=pid,
                                  save_dir=save_dir, data_dir=data_dir,
                                  epochs=epochs, resume=resume)
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
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, f"child {i} rc={p.returncode}\n{err[-3000:]}"
            for line in out.splitlines():
                if line.startswith("MHTRAIN"):
                    _, pid_s, acc = line.split()
                    accs[int(pid_s)] = float(acc)
        assert set(accs) == {0, 1}
        return accs

    accs = run_round(epochs=2, resume=False)
    # replicated eval from local state replicas: identical metrics
    assert accs[0] == accs[1], accs
    # pid 0 writes checkpoints; the loop must have produced both files
    assert os.path.exists(os.path.join(save_dir, "TrackNet_cur.pt"))
    assert os.path.exists(os.path.join(save_dir, "TrackNet_best.pt"))
    # both processes wrote their own scalar logs without clobbering
    assert os.path.isdir(os.path.join(save_dir, "logs"))
    assert os.path.isdir(os.path.join(save_dir, "logs_p1"))

    # Resume for one more epoch: the checkpointed host-numpy state must be
    # restored BEFORE mesh replication (restore-after-replicate would hand
    # the cross-process program non-global arrays and fail at dispatch).
    accs2 = run_round(epochs=3, resume=True)
    assert accs2[0] == accs2[1], accs2
    assert accs2[0] >= accs[0] - 1e-9, (accs, accs2)
