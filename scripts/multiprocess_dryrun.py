"""True multi-process distributed dryrun: N processes x D virtual CPU devices.

The single-process dryruns (``__graft_entry__.dryrun_multichip``,
tests/test_multichip_lifecycle.py) validate sharding *semantics*, but every
collective still runs inside one JAX runtime.  Real multi-host TPU jobs add
a second failure surface — the cross-process coordination path
(``jax.distributed`` gRPC coordination service, cross-process collectives,
per-host input sharding, checkpoint barriers) — which is exactly where the
reference-shaped training loop could deadlock or silently diverge
(training/trainer.py data-parallel notes).  This script exercises that
surface without TPU pod hardware: it spawns N OS processes, each owning D
``--xla_force_host_platform_device_count`` CPU devices, joins them via
``jax.distributed.initialize`` (the same call a pod worker makes,
parallel/runtime.py), and asserts:

 1. **Host-sharded input**: each process's ``GrainDataLoader`` defaults to
    its own disjoint shard (``shard_index == process_index``) with equal
    per-host batch counts (data/grain_loader.py — the equal-shard
    truncation exists precisely so multi-host step counts agree).
 2. **Cross-process XE training**: ``make_sharded_xe_step`` over the global
    dp mesh with per-process local batches assembled by
    ``jax.make_array_from_process_local_data``; the (replicated) loss is
    identical on every process, and identical to a single-process run of
    the same global batch sequence (the driver computes that baseline).
 3. **Checkpoint across the barrier**: process-0-gated native save +
    ``sync_global_devices`` barrier -> every process restores -> the
    resumed loss trajectory is bit-identical to the uninterrupted one.

Usage (driver spawns the workers):

    python scripts/multiprocess_dryrun.py [--nprocs 2] [--devices 4]

Exit 0 + "multiprocess dryrun ok" on success.  Also run by
tests/test_multiprocess.py.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_STEPS = 6
SAVE_AT = 3  # checkpoint after this many steps, resume replays the rest
GLOBAL_BS = 16
D_MODEL, HEADS, LAYERS, D_FF, D_FEATURE = 64, 4, 2, 128, 32


def _global_batch(vocab, step: int):
    """Deterministic synthetic global batch for `step` (same in every
    process and in the single-process baseline)."""
    import numpy as np

    sys.path.insert(0, REPO)
    from __graft_entry__ import _make_batch

    batch = _make_batch(
        vocab, bs=GLOBAL_BS, n_regions=8, d_feature=D_FEATURE,
        seed=1000 + step,
    )
    return {k: np.asarray(v) for k, v in batch.items()}


def _build_model_and_state(mesh=None):
    import jax

    sys.path.insert(0, REPO)
    from __graft_entry__ import _model_config, _make_batch, _tiny_vocab

    from openviic_tpu.builders import build_model
    from openviic_tpu.training.optim import make_optimizer

    vocab = _tiny_vocab(size=64, max_len=10)
    model = build_model(_model_config(D_MODEL, HEADS, LAYERS, D_FF, D_FEATURE), vocab)
    init_batch = _make_batch(vocab, bs=2, n_regions=8, d_feature=D_FEATURE)
    params = model.init(jax.random.PRNGKey(0), init_batch)
    optimizer = make_optimizer(d_model=D_MODEL, warmup=100, base_lr=1.0)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": 0,
        "rng": jax.random.PRNGKey(42),
    }
    return vocab, model, optimizer, state


def run_worker(proc_id: int, nprocs: int, port: int, data_dir: str,
               out_dir: str) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    import numpy as np
    from jax.experimental import multihost_utils

    from openviic_tpu.parallel import batch_sharding, make_mesh
    from openviic_tpu.parallel.mesh import shard_state
    from openviic_tpu.training import checkpoint as ckpt

    assert jax.process_count() == nprocs, "coordination service mismatch"
    mesh = make_mesh({"data": jax.device_count()})
    result: dict = {
        "proc_id": proc_id,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }

    # ---- 1. host-sharded grain input --------------------------------------
    from openviic_tpu.config import ConfigNode
    from openviic_tpu.data.datasets import DictionaryDataset
    from openviic_tpu.data.grain_loader import GrainDataLoader
    from openviic_tpu.data.vocab import Vocab

    data_cfg = ConfigNode({
        "MIN_FREQ": 1,
        "VOCAB": {
            "TOKENIZER": None, "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
            "BOS_TOKEN": "<bos>", "EOS_TOKEN": "<eos>",
            "PAD_TOKEN": "<pad>", "UNK_TOKEN": "<unk>",
            "USE_MAPPING": False, "PRETRAINED_LANGUAGE_MODEL": None,
        },
        "JSON_PATH": {
            "TRAIN": f"{data_dir}/train.json",
            "DEV": f"{data_dir}/dev.json",
            "TEST": f"{data_dir}/test.json",
        },
        "FEATURE_PATH": {
            "FEATURES": f"{data_dir}/features",
            "SCENE_TEXT": None, "IMAGE": None,
        },
    })
    data_vocab = Vocab(data_cfg)
    # DictionaryDataset: one sample per image, carries image_id/filename —
    # lets the driver assert the hosts' shards are disjoint
    train_ds = DictionaryDataset(data_cfg.JSON_PATH.TRAIN, data_vocab, data_cfg)
    loader = GrainDataLoader(train_ds, batch_size=4, shuffle=True, seed=7)
    assert loader.shard_index == proc_id, (
        f"grain loader shard_index {loader.shard_index} != process {proc_id}"
    )
    assert loader.shard_count == nprocs
    batches = list(loader)
    # record which images this host saw so the driver can assert shards are
    # disjoint, plus the batch count that must be equal across hosts
    seen = []
    for b in batches:
        seen.extend(str(fn) for fn in b.image_id)
    result["grain_batches"] = len(batches)
    result["grain_images"] = sorted(seen)

    # ---- 2. cross-process sharded XE steps ---------------------------------
    from openviic_tpu.parallel import make_sharded_xe_step

    vocab, model, optimizer, state = _build_model_and_state()
    state = shard_state(state, mesh, optimizer)
    xe_step = make_sharded_xe_step(model, optimizer, mesh)

    sharding = batch_sharding(mesh)
    local = GLOBAL_BS // nprocs

    def device_batch(step: int):
        g = _global_batch(vocab, step)
        return {
            k: jax.make_array_from_process_local_data(
                sharding, v[proc_id * local:(proc_id + 1) * local]
            )
            for k, v in g.items()
        }

    losses = []
    ckpt_path = os.path.join(out_dir, "ckpt", "mp_model")
    os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
    for step in range(N_STEPS):
        state, loss = xe_step(state, device_batch(step))
        losses.append(float(loss))
        if step + 1 == SAVE_AT:
            # process-0-gated save of the (dp-replicated) state + barrier —
            # the coordination pattern a multi-host trainer must use
            if proc_id == 0:
                # dp-replicated leaves are fully addressable on every host,
                # so the plain host save works from process 0
                ckpt.save_checkpoint(
                    ckpt_path, state, extras={"step_saved": step + 1}
                )
            multihost_utils.sync_global_devices("openviic_mp_ckpt_saved")
    result["losses"] = losses

    # ---- 3. restore on every process, replay, compare ---------------------
    _, model2, optimizer2, state2 = _build_model_and_state()
    loaded = ckpt.load_checkpoint(
        ckpt_path, params_template=state2["params"],
        opt_state_template=state2["opt_state"],
    )
    rstate = loaded["state"]
    rstate["rng"] = state2["rng"]
    rstate = shard_state(rstate, mesh, optimizer2)
    xe_step2 = make_sharded_xe_step(model2, optimizer2, mesh)
    resumed = []
    for step in range(SAVE_AT, N_STEPS):
        rstate, loss = xe_step2(rstate, device_batch(step))
        resumed.append(float(loss))
    result["resumed_losses"] = resumed

    with open(os.path.join(out_dir, f"worker_{proc_id}.json"), "w") as f:
        json.dump(result, f)
    multihost_utils.sync_global_devices("openviic_mp_done")


def run_baseline(data_dir: str, out_dir: str) -> None:
    """Single-process run of the same global batch sequence (8 local
    devices, same dp-8 mesh) — the cross-process runs must match this."""
    import jax

    from openviic_tpu.parallel import batch_sharding, make_mesh, make_sharded_xe_step
    from openviic_tpu.parallel.mesh import shard_state

    mesh = make_mesh({"data": jax.device_count()})
    vocab, model, optimizer, state = _build_model_and_state()
    state = shard_state(state, mesh, optimizer)
    xe_step = make_sharded_xe_step(model, optimizer, mesh)
    sharding = batch_sharding(mesh)
    losses = []
    for step in range(N_STEPS):
        g = _global_batch(vocab, step)
        batch = {k: jax.device_put(v, sharding) for k, v in g.items()}
        state, loss = xe_step(state, batch)
        losses.append(float(loss))
    with open(os.path.join(out_dir, "baseline.json"), "w") as f:
        json.dump({"losses": losses}, f)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env(devices: int) -> dict:
    """CPU-only env for a worker: no axon plugin, D virtual devices."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # site hook would force the TPU
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def run_driver(nprocs: int, devices: int, out_dir: str, timeout: int) -> None:
    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="ov_mp_")
    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    if not os.path.isdir(data_dir):
        sys.path.insert(0, HERE)
        from make_tiny_dataset import main as make_ds

        make_ds(data_dir, n_images=24, signal=True, grids=False)

    port = _free_port()
    total = nprocs * devices

    # baseline: one process owning all `total` devices
    base_env = _clean_env(total)
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--baseline",
         "--data-dir", data_dir, "--out-dir", out_dir],
        env=base_env, timeout=timeout,
    ).returncode
    if rc != 0:
        raise SystemExit(f"baseline run failed (rc={rc})")

    env = _clean_env(devices)
    logs = [os.path.join(out_dir, f"worker_{i}.log") for i in range(nprocs)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--nprocs", str(nprocs), "--port", str(port),
             "--data-dir", data_dir, "--out-dir", out_dir],
            env=env, stdout=open(logs[i], "w"), stderr=subprocess.STDOUT,
        )
        for i in range(nprocs)
    ]
    rcs = [p.wait(timeout=timeout) for p in procs]
    if any(rc != 0 for rc in rcs):
        for i, rc in enumerate(rcs):
            if rc != 0:
                with open(logs[i]) as f:
                    tail = f.read()[-3000:]
                print(f"--- worker {i} (rc={rc}) log tail ---\n{tail}",
                      file=sys.stderr)
        raise SystemExit(f"worker exit codes {rcs}")

    results = []
    for i in range(nprocs):
        with open(os.path.join(out_dir, f"worker_{i}.json")) as f:
            results.append(json.load(f))
    with open(os.path.join(out_dir, "baseline.json")) as f:
        baseline = json.load(f)

    # every process computed the identical global loss sequence
    for r in results[1:]:
        assert r["losses"] == results[0]["losses"], (
            "loss divergence across processes:"
            f" {r['losses']} vs {results[0]['losses']}"
        )
    # which must match the single-process baseline bit-for-bit (same global
    # mesh shape, same XLA program, CPU determinism)
    import numpy as np

    np.testing.assert_allclose(
        results[0]["losses"], baseline["losses"], rtol=0, atol=1e-6,
        err_msg="multi-process XE diverged from the single-process baseline",
    )
    # resume replays the post-checkpoint trajectory exactly
    for r in results:
        assert r["resumed_losses"] == r["losses"][SAVE_AT:], (
            f"proc {r['proc_id']}: resumed {r['resumed_losses']} != "
            f"original tail {r['losses'][SAVE_AT:]}"
        )
    # grain shards: equal batch counts, disjoint images
    counts = {r["grain_batches"] for r in results}
    assert len(counts) == 1, f"unequal per-host batch counts: {counts}"
    all_imgs = [img for r in results for img in r["grain_images"]]
    assert len(all_imgs) == len(set(all_imgs)), "hosts saw overlapping images"
    assert results[0]["global_devices"] == total

    print(
        f"multiprocess dryrun ok: {nprocs} processes x {devices} devices, "
        f"losses match baseline to 1e-6 ({baseline['losses'][:3]}...), "
        f"resume bit-identical, grain shards disjoint "
        f"({len(all_imgs)} images over {results[0]['grain_batches']} "
        f"batches/host)"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices", type=int, default=4,
                    help="virtual CPU devices per process")
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--timeout", type=int, default=1200)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--baseline", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--data-dir", default="", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.baseline:
        run_baseline(args.data_dir, args.out_dir)
    elif args.worker is not None:
        run_worker(args.worker, args.nprocs, args.port, args.data_dir,
                   args.out_dir)
    else:
        run_driver(args.nprocs, args.devices, args.out_dir, args.timeout)


if __name__ == "__main__":
    main()
