"""Multi-process (DCN analogue) seed replication via jax.distributed.

VERDICT r1 item 4: a 2-process CPU run (each process = one "slice")
replicating seeds, aggregated with one cross-process all-gather
(SURVEY.md section 2.8 seed-level row; reference multi_modal.py:118-131).
Runs in subprocesses because jax.distributed must initialize before any
backend exists — the test session's backend is already up.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "run_distributed_seeds.py")


def _json_lines(text: str) -> list:
    """Parse the result records the subprocess printed, one JSON object per
    line. Gloo/backend chatter can be appended to the SAME stdout line as a
    record (observed: '{...}[Gloo] Rank 0 is connected...'), so stop at the
    end of the first object instead of requiring the whole line to be JSON."""
    dec = json.JSONDecoder()
    return [dec.raw_decode(line)[0]
            for line in text.splitlines() if line.startswith("{")]


class TestLocalHelpers:
    def test_local_seeds_strided_split(self):
        from mfm_tpu.parallel.distributed import local_seeds

        seeds = [i**10 for i in range(10)]
        s0 = local_seeds(seeds, 0, 2)
        s1 = local_seeds(seeds, 1, 2)
        assert sorted(s0 + s1) == sorted(seeds)
        assert len(s0) == len(s1) == 5

    def test_local_seeds_rejects_uneven(self):
        from mfm_tpu.parallel.distributed import local_seeds

        with pytest.raises(ValueError):
            local_seeds([0, 1, 2], 0, 2)

    def test_aggregate_row_matches_reference_rule(self):
        from mfm_tpu.parallel.distributed import aggregate_row

        rows = np.arange(12.0).reshape(4, 3)
        mean, ci = aggregate_row(rows)
        np.testing.assert_allclose(mean, rows.mean(0))
        np.testing.assert_allclose(ci, 1.96 * rows.std(0))


@pytest.mark.slow
class TestMultiControllerTraining:
    def test_single_run_spans_processes(self):
        """One MFM training run data-parallel across 2 processes: the chain
        ensemble shards over the process-spanning mesh; replicated metrics
        must be identical on every controller."""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        script = os.path.join(REPO, "benchmarks", "run_distributed_mfm.py")
        out = subprocess.run(
            [
                sys.executable, script, "--learning-iter", "12",
                "--coordinator", "localhost:13197",
            ],
            capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
        )
        lines = _json_lines(out.stdout)
        assert len(lines) == 2, out.stdout + out.stderr
        a, b = lines
        assert {a["process_id"], b["process_id"]} == {0, 1}
        for rec in lines:
            assert rec["global_devices"] == 2 * rec["local_devices"]
        # single-program multiple-controller: replicated outputs agree
        assert a["final_loss"] == b["final_loss"]
        assert a["final_beta"] == b["final_beta"]
        assert a["mean_acceptance"] == b["mean_acceptance"]


@pytest.mark.slow
class TestTwoProcessRun:
    def test_two_processes_agree(self, tmp_path):
        """Both processes must see 4 global devices, gather all rows, and
        print the identical aggregate."""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # the script forces cpu itself
        out = subprocess.run(
            [
                sys.executable, SCRIPT,
                "--num-seeds", "2", "--learning-iter", "8",
                "--coordinator", "localhost:13141",
            ],
            capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
        )
        lines = _json_lines(out.stdout)
        assert len(lines) == 2, out.stdout + out.stderr
        by_pid = {rec["process_id"]: rec for rec in lines}
        assert set(by_pid) == {0, 1}
        for rec in lines:
            assert rec["total_rows"] == 2
            # a true multi-process runtime: both processes' devices visible
            assert rec["global_devices"] == 2 * rec["local_devices"]
        assert by_pid[0]["aggregate_mean"] == by_pid[1]["aggregate_mean"]
        assert by_pid[0]["aggregate_ci95"] == by_pid[1]["aggregate_ci95"]
        # the two processes ran DIFFERENT seeds
        assert by_pid[0]["local_seeds"] != by_pid[1]["local_seeds"]


@pytest.mark.slow
class TestMultiProcessCheckpointResume:
    def test_resume_bit_matches_uninterrupted(self, tmp_path):
        """VERDICT r2 item 5: orbax checkpoints of the SHARDED carry under a
        2-process mesh. Run A trains 16 iters checkpointing every 4-step
        chunk; deleting the checkpoints past step 8 simulates a mid-run
        kill; run B restores at 8 and continues. Every process's final
        state digest (local shards of chain + params + beta) must equal
        run A's — the resumed trajectory is bit-identical."""
        import shutil

        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        script = os.path.join(REPO, "benchmarks", "run_distributed_mfm.py")
        ckpt = str(tmp_path / "ckpts")

        def launch(port):
            out = subprocess.run(
                [
                    sys.executable, script, "--learning-iter", "16",
                    "--chunk-size", "4", "--checkpoint-dir", ckpt,
                    "--coordinator", f"localhost:{port}",
                ],
                capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
            )
            lines = _json_lines(out.stdout)
            assert len(lines) == 2, out.stdout + out.stderr
            return {rec["process_id"]: rec for rec in lines}

        run_a = launch(13251)
        steps = sorted(os.listdir(ckpt))
        assert steps == [
            "step_00000004", "step_00000008", "step_00000012", "step_00000016"
        ], steps
        for name in steps:
            if int(name.split("_")[1]) > 8:
                shutil.rmtree(os.path.join(ckpt, name))

        run_b = launch(13253)
        for pid in (0, 1):
            assert run_a[pid]["state_digest"] == run_b[pid]["state_digest"], pid
            assert run_a[pid]["final_beta"] == run_b[pid]["final_beta"]


@pytest.mark.slow
class TestMultiControllerPhiFour:
    def test_phi_four_1024_chains(self):
        """VERDICT r2 item 9: the multi-controller demo at the real
        phi-four benchmark shape (d=64, 1024 global chains) — per-chunk
        metrics must be identical across controllers (replicated outputs,
        one digest), and a steady-rate throughput row comes out."""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        script = os.path.join(REPO, "benchmarks", "run_distributed_mfm.py")
        out = subprocess.run(
            [
                sys.executable, script, "--example", "phi-four",
                "--learning-iter", "40", "--chunk-size", "20",
                "--coordinator", "localhost:13353",
            ],
            capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
        )
        recs = _json_lines(out.stdout)
        assert len(recs) == 2, out.stdout + out.stderr
        a, b = recs
        assert a["num_chain_global"] == 1024
        # replicated per-chunk metrics: bit-identical across controllers
        assert a["chunks_digest"] == b["chunks_digest"]
        assert a["n_chunks"] == b["n_chunks"] == 2
        # sharded state: each controller holds DIFFERENT local shards
        assert a["state_digest"] != b["state_digest"]
        for rec in recs:
            assert rec["steady_iters_per_sec"] is None or rec[
                "steady_iters_per_sec"
            ] > 0
