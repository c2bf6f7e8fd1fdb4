"""Multi-host (multi-process) training-path test: two real OS processes join
one JAX runtime over the gloo CPU backend, build a process-spanning dp mesh,
and run a train step whose psum crosses the process boundary — the pod launch
path of ``cli/train.py`` (counterpart of the reference's NCCL process group,
``transkun/train.py:29-31,400-403``)."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_COORDINATOR"] = "127.0.0.1:%PORT%"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    os.environ["JAX_NUM_PROCESSES"] = "2"
    sys.path.insert(0, %REPO%)

    from transkun_tpu.parallel import init_distributed, make_mesh, process_info
    import jax
    assert init_distributed()
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from transkun_tpu.data.labels import encode_batch
    from transkun_tpu.data.note import Note
    from transkun_tpu.models import ModelConfig, TransKun
    from transkun_tpu.ops import frontend
    from transkun_tpu.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    rank, world = process_info()
    assert world == 2
    mesh = make_mesh()   # 2 procs x 2 virtual devices = 4-way dp
    assert mesh.shape["dp"] == 4

    conf = ModelConfig.from_dict(dict(
        f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256,
        fs=4000, nExtraWins=2, baseSize=8, nHead=2, nLayers=1,
        scoringExpansionFactor=2, segmentSizeInSecond=1.0,
        segmentHopSizeInSecond=0.5, scoreDropoutProb=0.0,
        contextDropoutProb=0.0, velocityDropoutProb=0.0,
        refinedOFDropoutProb=0.0,
    ))
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=1e-3, n_iter=100)
    step = make_train_step(model.module, opt, mesh=mesh)
    state = init_train_state(params, opt)

    # each process holds ITS half of the global batch of 4 (rank sharding)
    rng = np.random.default_rng(0)
    audio_all = (rng.normal(size=(4, 4000, 1)) * 0.1).astype(np.float32)
    audio = audio_all[rank * 2 : rank * 2 + 2]
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = np.asarray(frontend.make_frame(x, 64, 256))
    notes = [[Note(0.1, 0.4, 60, 80), Note(0.5, 0.8, 64, 90)]] * 2
    labels = encode_batch(notes, 64 / 4000, model.targetMIDIPitch, 8)

    def to_global(a):
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P("dp")
        )

    # label-K agreement under rank-divergent density (ADVICE r4 medium):
    # rank 0 sees a dense 17-event trill on one pitch, rank 1 the sparse
    # chunk.  Without k_sync rank 0 would grow K to 32 while rank 1 stays
    # at 8 — inconsistent global shapes for the SPMD step.  The
    # allgather-max hook (exactly what cli/train.py wires) must make both
    # ranks grow to the same bucket.
    def k_sync(d):
        return int(np.max(multihost_utils.process_allgather(
            np.asarray(d, np.int32))))

    dense = (
        [[Note(0.01 + 0.05 * j, 0.03 + 0.05 * j, 60, 80) for j in range(17)]]
        * 2
        if rank == 0 else notes
    )
    lb = encode_batch(dense, 64 / 4000, model.targetMIDIPitch, 8,
                      k_sync=k_sync)
    ks = multihost_utils.process_allgather(np.int32(lb.begins.shape[-1]))
    assert ks[0] == ks[1] == 32, ks

    for i in range(2):
        state, metrics = step(
            state, to_global(frames),
            tuple(to_global(a) for a in labels.astuple()),
            jax.random.PRNGKey(i),
        )
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    gnorm = float(np.asarray(jax.device_get(metrics["grad_norm"])))
    assert np.isfinite(loss) and np.isfinite(gnorm)
    # params must be identical across processes: fingerprint and compare
    leaves = jax.tree.leaves(jax.device_get(state.params))
    fp = float(sum(np.asarray(l, np.float64).sum() for l in leaves))
    fps = multihost_utils.process_allgather(np.float64(fp))
    assert np.allclose(fps, fps[0]), fps
    print(f"MULTIHOST_OK rank={rank} loss={loss:.4f} fp={fp:.6f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 52310 + os.getpid() % 1000
    script = WORKER.replace("%PORT%", str(port)).replace("%REPO%", repr(repo))
    wfile = tmp_path / "worker.py"
    wfile.write_text(script)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(wfile), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out
    # both processes ended with the same loss
    losses = sorted(
        line.split("loss=")[1].split()[0]
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    )
    assert losses[0] == losses[1], losses
